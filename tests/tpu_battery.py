"""Consolidated on-chip measurement battery (replaces tpu_profile{2..15}).

One parameterized script for every recurring TPU measurement; results
append to runs/battery_ledger.jsonl so rounds build on each other
instead of re-learning numbers (VERDICT r3 item 10). Historic findings
from the retired per-round profile scripts live in NOTES.md.

Usage:
  python tests/tpu_battery.py stages          # per-stage breakdown
  python tests/tpu_battery.py levers base,nokill,...   # variant matrix
  python tests/tpu_battery.py fold            # gradient-fold micro A/B
  python tests/tpu_battery.py zero            # zero-work grid floor
  python tests/tpu_battery.py step            # full train step only
Multiple modes can be comma-joined: `stages,fold`.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

LEDGER = "/root/repo/runs/battery_ledger.jsonl"
RESULTS = {}


def record(name, ms):
    RESULTS[name] = round(ms, 3)
    print(f"{name}: {ms:.2f} ms", flush=True)


def t(name, fn, *args, n=20, donate=()):
    f = jax.jit(fn, donate_argnums=donate)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    record(name, (time.time() - t0) / n * 1000)
    return out


def setup():
    from tpu_bench2 import make_state

    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.render.common import RasterConfig

    params_d, model = make_state()
    side = 800
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    rc = RasterConfig(max_pairs=86 * 8192, exact_kill=False)  # bench.py cfg
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))
    return params_d, model, cam, UTConfig(), rc, gt, side


def train_step_fn(model, cam, ut_cfg, rc, gt, cap=100_352):
    from threedgrut_tpu.ops.ssim import ssim
    from threedgrut_tpu.optimizers.adam import adam_step
    from threedgrut_tpu.render.gut import render_gut

    lrs = None

    def step(pd, opt, lrs):
        def loss_fn(p):
            m = model.replace(params=model.params.replace(**p))
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            pred = out["pred_features"]
            l1 = jnp.mean(jnp.abs(pred - gt))
            s = ssim(pred.transpose(2, 0, 1)[None],
                     gt.transpose(2, 0, 1)[None])
            return 0.8 * l1 + 0.2 * (1.0 - s)
        loss, grads = jax.value_and_grad(loss_fn)(pd)
        active = jnp.arange(cap, dtype=jnp.int32) < model.n_active
        np_, no_ = adam_step(pd, grads, opt, lrs, update_mask=active)
        return np_, no_, loss

    return step


def mode_stages(ctx):
    """Per-stage breakdown at the bench workload."""
    params_d, model, cam, ut_cfg, rc, gt, side = ctx
    from threedgrut_tpu.ops import binning as binning_ops
    from threedgrut_tpu.ops import ut as ut_ops
    from threedgrut_tpu.ops.pallas.raster import CHUNK
    from threedgrut_tpu.ops.ssim import ssim
    from threedgrut_tpu.render.gut import render_gut

    gx = gy = side // 16

    def proj_fn(pd):
        m = model.replace(params=model.params.replace(**pd))
        return ut_ops.unscented_projection(
            cam, ut_cfg, m.params.positions, m.params.rotation,
            m.get_scale(), m.get_density()[:, 0], m.active_mask())

    proj = t("projection", proj_fn, params_d)

    def bin_fn(p, carry):
        return binning_ops.bin_particles(p, (gx, gy), rc.max_pairs,
                                         chunk=CHUNK, carry_perm=carry)
    t("binning+perm", lambda p: bin_fn(p, True), proj)
    t("binning noperm", lambda p: bin_fn(p, False), proj)

    def fwd(pd):
        m = model.replace(params=model.params.replace(**pd))
        return render_gut(cam, ut_cfg, rc, m, sh_degree=3)["pred_features"]

    def fwdbwd(pd):
        def loss(p):
            m = model.replace(params=model.params.replace(**p))
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            return jnp.mean(jnp.abs(out["pred_features"] - gt))
        return jax.grad(loss)(pd)

    pred = t("pipeline fwd", fwd, params_d)
    t("pipeline fwd+bwd (L1)", fwdbwd, params_d)
    t("ssim fwd+bwd", lambda p, g: jax.grad(
        lambda pp: ssim(pp.transpose(2, 0, 1)[None],
                        g.transpose(2, 0, 1)[None]))(p), pred, gt)

    from threedgrut_tpu.optimizers.adam import init_adam_state
    opt = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    step = train_step_fn(model, cam, ut_cfg, rc, gt)
    t("train step", step, params_d, opt, lrs, n=10)

    # raster kernel isolated (records/rays precomputed outside the timer)
    iso = raster_inputs(ctx)
    records, ts, tc, rays, kcfg = iso
    from threedgrut_tpu.ops.pallas.raster import rasterize_tiles
    t("raster fwd (isolated)", lambda r: rasterize_tiles(
        r, ts, tc, rays, kcfg, False), records)
    t("raster fwd+bwd (isolated)", lambda r: jax.grad(
        lambda rr: jnp.sum(rasterize_tiles(rr, ts, tc, rays, kcfg,
                                           False)[:, :, :4]))(r), records)


def raster_inputs(ctx):
    """Build (records, tile_start, tile_count, rays, kcfg) once, on host."""
    params_d, model, cam, ut_cfg, rc, gt, side = ctx
    from threedgrut_tpu.ops import binning as binning_ops
    from threedgrut_tpu.ops import ut as ut_ops
    from threedgrut_tpu.ops.pallas.raster import CHUNK, RasterKernelConfig
    from threedgrut_tpu.ops.quaternion import quat_normalize, quat_to_rotmat
    from threedgrut_tpu.ops.sh import eval_sh_radiance
    from threedgrut_tpu.ops.ut import sensor_position
    from threedgrut_tpu.render.gut import (_ray_aabb, _scene_aabb,
                                           camera_rays_world, pack_rays)

    gx = gy = side // 16
    kcfg_static = RasterKernelConfig(exact_kill=rc.exact_kill)

    @jax.jit
    def build(pd):
        m = model.replace(params=model.params.replace(**pd))
        proj = ut_ops.unscented_projection(
            cam, ut_cfg, m.params.positions, m.params.rotation,
            m.get_scale(), m.get_density()[:, 0], m.active_mask())
        b = binning_ops.bin_particles(proj, (gx, gy), rc.max_pairs,
                                      chunk=CHUNK, carry_perm=False)
        kcfg = RasterKernelConfig(exact_kill=rc.exact_kill)
        feats = eval_sh_radiance(m.sh_coeffs(), proj.view_dir, 3)
        feats = jnp.maximum(feats, 0.0)
        quats = quat_normalize(m.params.rotation)
        origin = sensor_position(cam)
        rot = quat_to_rotmat(quats)
        inv_s = 1.0 / m.get_scale()
        m_mat = inv_s[:, :, None] * jnp.swapaxes(rot, 1, 2)
        delta = origin - m.params.positions
        gro = jnp.einsum("nij,nj->ni", m_mat, delta, precision="highest")
        cap = m.capacity
        table = jnp.concatenate([
            gro, m_mat.reshape(-1, 9), m.get_density(), feats], axis=1)
        records = table[b.pair_particle]
        n_chunks = records.shape[0] // CHUNK
        records = records.reshape(n_chunks, CHUNK, 16).transpose(0, 2, 1)
        ray_o, ray_d = camera_rays_world(cam)
        lo, hi = _scene_aabb(m)
        tmin, tmax = _ray_aabb(ray_o, ray_d, lo, hi)
        rays = pack_rays(ray_o, ray_d, tmin, tmax, (gx, gy))
        tile_count = b.tile_start[1:] - b.tile_start[:-1]
        return records, b.tile_start[:-1], tile_count, rays

    records, ts, tc, rays = build(params_d)
    jax.block_until_ready(records)
    return records, ts, tc, rays, kcfg_static


def mode_zero(ctx):
    """Per-tile fixed-cost floor: same grid, all segments empty."""
    params_d, model, cam, ut_cfg, rc, gt, side = ctx
    records, ts, tc, rays, kcfg = raster_inputs(ctx)
    from threedgrut_tpu.ops.pallas.raster import rasterize_tiles
    tz = jnp.zeros_like(tc)
    t("raster fwd zero-work", lambda r: rasterize_tiles(
        r, ts, tz, rays, kcfg, False), records)
    t("raster bwd zero-work", lambda r: jax.grad(
        lambda rr: jnp.sum(rasterize_tiles(rr, ts, tz, rays, kcfg,
                                           False)[:, :, :4]))(r), records)


def mode_fold(ctx):
    """Gradient-fold micro A/B: argsort+gather vs sort-carry."""
    from threedgrut_tpu.ops.pallas.fold import fold_sorted_intervals

    p, cap, r = 86 * 8192, 100_352, 16
    rng = np.random.default_rng(0)
    seg = np.sort(rng.integers(0, cap, p)).astype(np.int32)
    counts = np.bincount(seg, minlength=cap)
    nxt = np.cumsum(counts).astype(np.int32)
    slot = (nxt - counts).astype(np.int32)
    rank = np.repeat(np.arange(cap), counts).astype(np.float32)
    perm = rng.permutation(p).astype(np.int32)
    d_rows = (rng.normal(size=(p, r)) * 1e-3).astype(np.float32)
    rank_particle = rng.permutation(cap).astype(np.int32)
    pm, dr = jnp.asarray(perm), jnp.asarray(d_rows)
    rk = jnp.asarray(rank)
    st, en = jnp.asarray(slot), jnp.asarray(nxt)
    rp = jnp.asarray(rank_particle)

    from threedgrut_tpu.ops.pallas.fold import fold_sorted_intervals_wide

    t("argsort 700k i32", lambda x: jnp.argsort(x), pm)
    inv = jnp.argsort(pm)
    t("row gather 700k x16", lambda d: d[inv], dr)
    t("row gather 700k x16 bf16", lambda d: d.astype(jnp.bfloat16)[inv],
      dr)
    t("fold kernel 700k->100k", lambda d: fold_sorted_intervals(
        d, rk, st, en), dr)
    a_wide = t("fold wide 700k->100k", lambda d: fold_sorted_intervals_wide(
        d, rk, st, en), dr)
    t("fold wide bf16", lambda d: fold_sorted_intervals_wide(
        d.astype(jnp.bfloat16), rk, st, en), dr)
    a_nar = fold_sorted_intervals(dr, rk, st, en)
    print(f"wide vs narrow max|d|: "
          f"{float(jnp.max(jnp.abs(a_wide - a_nar))):.3e}")

    def route_argsort(d):
        pre = d[jnp.argsort(pm)]
        d_rank = fold_sorted_intervals(pre, rk, st, en)
        return d_rank[jnp.argsort(rp)]

    def sort_carry(key, d):
        cols = tuple(d[:, i] for i in range(d.shape[1]))
        out = jax.lax.sort((key,) + cols, num_keys=1, is_stable=False)
        return jnp.stack(out[1:], axis=1)

    def route_sortcarry(d):
        pre = sort_carry(pm, d)
        d_rank = fold_sorted_intervals(pre, rk, st, en)
        return sort_carry(rp, d_rank)

    a = t("fold route argsort+gather", route_argsort, dr)
    b = t("fold route sort-carry", route_sortcarry, dr)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"route diff max: {err:.3e}")
    # binning-sort micro: the 3-operand tile sort at bench scale
    tile_keys = jnp.asarray(rng.integers(0, 2500, p).astype(np.int32))
    iota = jnp.arange(p, dtype=jnp.int32)
    t("lax.sort 3-op 700k", lambda k: jax.lax.sort(
        (k, iota, iota), num_keys=1, is_stable=True), tile_keys)
    t("lax.sort 2-op 700k", lambda k: jax.lax.sort(
        (k, iota), num_keys=1, is_stable=True), tile_keys)


def mode_levers(ctx, variants):
    params_d, model, cam, ut_cfg, rc, gt, side = ctx
    from threedgrut_tpu.optimizers.adam import init_adam_state
    opt = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    named = {
        "base": rc,
        "kill": rc.replace(exact_kill=True),
        "bf16": rc.replace(records_bf16=True),
        "noperm": rc.replace(grad_fold=False),
        "noee": rc.replace(early_exit=False),
        "fused": rc.replace(fused_mxu=True),
        "noee+fused": rc.replace(early_exit=False, fused_mxu=True),
        "foldwide": rc.replace(fold_wide=True),
        "gradbf16": rc.replace(fold_wide=True, grad_bf16=True),
        "aligned": rc.replace(aligned_segments=True),
        "flat": rc.replace(flat_grid=True),
        "fusedbwd": rc.replace(fused_mxu_bwd=True),
        "skipbwd": rc.replace(skip_dead_bwd=True),
    }
    from threedgrut_tpu.ops.pallas.raster import (RasterKernelConfig,
                                                  rasterize_tiles)
    records, ts, tc, rays, _ = raster_inputs(ctx)
    for v in variants:
        cfg = named[v]
        kcfg = RasterKernelConfig(exact_kill=cfg.exact_kill,
                                  early_exit=cfg.early_exit,
                                  fused_mxu=cfg.fused_mxu,
                                  fused_mxu_bwd=cfg.fused_mxu_bwd,
                                  records_bf16=cfg.records_bf16,
                                  flat_grid=cfg.flat_grid,
                                  scan_mxu=cfg.scan_mxu,
                                  skip_dead_bwd=cfg.skip_dead_bwd)
        t(f"[{v}] raster fwd", lambda r, kc=kcfg: rasterize_tiles(
            r, ts, tc, rays, kc, False), records)
        t(f"[{v}] raster fwd+bwd", lambda r, kc=kcfg: jax.grad(
            lambda rr: jnp.sum(rasterize_tiles(rr, ts, tc, rays, kc,
                                               False)[:, :, :4]))(r),
          records)
        step = train_step_fn(model, cam, ut_cfg, cfg, gt)
        t(f"[{v}] train step", step, params_d, opt, lrs, n=10)


def mode_cot(ctx):
    """dot_cot pass-count A/B: step time + grad cosine, one process.

    The cotangent dots (pullback reductions) ride mxu.dot_cot; pass
    count is a trace-time module global, so flipping it and re-jitting
    compares 3-pass (exact adjoint) vs 1-pass (inexact adjoint, no hi/lo
    VPU splits) on identical inputs.
    """
    params_d, model, cam, ut_cfg, rc, gt, side = ctx
    from threedgrut_tpu.ops.pallas import mxu
    from threedgrut_tpu.ops.ssim import ssim
    from threedgrut_tpu.optimizers.adam import init_adam_state
    from threedgrut_tpu.render.gut import render_gut

    opt = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}

    def grads_fn(pd):
        def loss_fn(p):
            m = model.replace(params=model.params.replace(**p))
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            pred = out["pred_features"]
            l1 = jnp.mean(jnp.abs(pred - gt))
            s = ssim(pred.transpose(2, 0, 1)[None],
                     gt.transpose(2, 0, 1)[None])
            return 0.8 * l1 + 0.2 * (1.0 - s)
        return jax.grad(loss_fn)(pd)

    saved = mxu._COT_PASSES
    results = {}
    for passes in (3, 1):
        mxu._COT_PASSES = passes
        step = train_step_fn(model, cam, ut_cfg, rc, gt)
        t(f"[cot{passes}] train step", step, params_d, opt, lrs, n=10)
        g = jax.jit(grads_fn)(params_d)
        results[passes] = {k: np.asarray(v).ravel()
                           for k, v in jax.block_until_ready(g).items()}
    mxu._COT_PASSES = saved
    for k in results[3]:
        a, b = results[1][k], results[3][k]
        denom = float(np.linalg.norm(a) * np.linalg.norm(b)) + 1e-30
        cos = float(a @ b) / denom
        record(f"[cot] gradcos {k}", cos * 1000.0)  # printed as x1e-3
        print(f"  gradcos[{k}] = {cos:.7f}", flush=True)


def mode_step(ctx):
    params_d, model, cam, ut_cfg, rc, gt, side = ctx
    from threedgrut_tpu.optimizers.adam import init_adam_state
    opt = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    step = train_step_fn(model, cam, ut_cfg, rc, gt)
    t("train step", step, params_d, opt, lrs, n=10)


def main():
    modes = (sys.argv[1] if len(sys.argv) > 1 else "stages").split(",")
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["base"])
    print("devices:", jax.devices(), flush=True)
    ctx = setup()
    for m in modes:
        print(f"--- mode {m} ---", flush=True)
        if m == "stages":
            mode_stages(ctx)
        elif m == "zero":
            mode_zero(ctx)
        elif m == "fold":
            mode_fold(ctx)
        elif m == "levers":
            mode_levers(ctx, variants)
        elif m == "step":
            mode_step(ctx)
        elif m == "cot":
            mode_cot(ctx)
        else:
            raise SystemExit(f"unknown mode {m}")
    os.makedirs(os.path.dirname(LEDGER), exist_ok=True)
    with open(LEDGER, "a") as f:
        f.write(json.dumps({"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                            "modes": modes, "results": RESULTS}) + "\n")


if __name__ == "__main__":
    main()

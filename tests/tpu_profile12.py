"""Strip-kernel stage timing (round 2): isolate the raster fwd / bwd
pallas calls, the record gather+fold, and binning at the bench workload.

Run: python tests/tpu_profile12.py
"""
import sys, os, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    from tpu_bench2 import make_state
    from threedgrut_tpu.ops import binning as binning_ops
    from threedgrut_tpu.ops import ut as ut_ops
    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut
    from threedgrut_tpu.ops.pallas.raster import (
        CHUNK, RasterKernelConfig, _pallas_backward, rasterize_tiles)

    params_d, model = make_state()
    side = 800
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    ut_cfg = UTConfig()
    rc = RasterConfig(max_pairs=86 * 8192)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))

    gx = gy = side // 16

    def proj_fn(pd):
        m = model.replace(params=model.params.replace(**pd))
        return ut_ops.unscented_projection(
            cam, ut_cfg, m.params.positions, m.params.rotation,
            m.get_scale(), m.get_density()[:, 0], m.active_mask())

    proj = t("projection", proj_fn, params_d)

    def bin_fn(p):
        return binning_ops.bin_particles(p, (gx, gy), rc.max_pairs,
                                         chunk=CHUNK, carry_perm=True)

    b = t("binning+perm", bin_fn, proj)

    # --- build raster inputs once (mirrors render/gut.py) ---
    from threedgrut_tpu.ops.quaternion import quat_normalize, quat_to_rotmat
    from threedgrut_tpu.ops.sh import eval_sh_radiance
    from threedgrut_tpu.ops.ut import sensor_position
    from threedgrut_tpu.render.gut import (_ray_aabb, _scene_aabb,
                                           pack_rays)
    from threedgrut_tpu.render.common import camera_rays_world

    kcfg = RasterKernelConfig()

    def build_inputs(pd):
        m = model.replace(params=model.params.replace(**pd))
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
        return records, rays

    records, rays = t("table+gather+rays", build_inputs, params_d, n=10)
    tile_count = b.tile_start[1:] - b.tile_start[:-1]
    tile_start = b.tile_start[:-1]

    def fwd_only(recs):
        return rasterize_tiles(jax.lax.stop_gradient(recs), tile_start,
                               tile_count, rays, kcfg, False)

    fwd_out = t("raster fwd pallas", fwd_only, records)

    g_out = jnp.ones_like(fwd_out) * 1e-3

    def bwd_only(recs):
        return _pallas_backward(recs, tile_start, tile_count, rays,
                                fwd_out, g_out, kcfg, False)

    t("raster bwd pallas", bwd_only, records)

    # gather + fold backward (grad_fold path) alone
    def gather_fold(pd):
        m = model.replace(params=model.params.replace(**pd))
        from threedgrut_tpu.render.gut import _gather_records_fold
        table = jnp.concatenate([
            m.params.positions, m.params.rotation, m.get_scale(),
            m.get_density(), m.params.features_albedo,
            jnp.zeros((m.capacity, 2), jnp.float32)], axis=1)

        def f(tb):
            recs = _gather_records_fold(tb, b.pair_particle, b.perm,
                                        b.pair_rank, b.rank_slot,
                                        b.rank_next, b.rank_particle,
                                        False)
            return jnp.sum(recs * 1e-6)

        return jax.grad(lambda tb: f(tb))(table)

    t("gather+fold fwd+bwd", gather_fold, params_d, n=10)

    # full render fwd and fwd+bwd
    def fwd(pd):
        m = model.replace(params=model.params.replace(**pd))
        return render_gut(cam, ut_cfg, rc, m, sh_degree=3)["pred_features"]

    t("render fwd total", fwd, params_d)

    def fwdbwd(pd):
        def loss(p):
            m = model.replace(params=model.params.replace(**p))
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            return jnp.mean(jnp.abs(out["pred_features"] - gt))
        return jax.grad(loss)(pd)

    t("render fwd+bwd (L1 only)", fwdbwd, params_d, n=10)


if __name__ == "__main__":
    main()

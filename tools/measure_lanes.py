"""Dead-lane census of the 3DGUT raster workload (CPU, no TPU needed).

Replays the bench.py scene through the real UT projection, then bins and
composites with a numpy oracle to measure exactly where [pixel x
candidate] lane evaluations go at different (pixel-block, CHUNK,
segment-layout, early-exit-granularity) design points. This sizes the
"sparser compositing" levers (VERDICT round 2, item 1) before building
any of them.

Outputs a table of simulated eval counts:
  visits        : chunk visits the kernel would execute
  lane_evals    : visits * block_px * CHUNK (the actual VPU work)
  real_evals    : (pixel, real-pair) pairs inside segments
  live_evals    : evals with alpha > 0 (spatially live)
  contrib_evals : live evals reached before the pixel's T died
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

TILE = 16
MIN_T = 1e-4


def build_scene():
    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 GaussianParams,
                                                 GaussianState)
    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.ops.sh import rgb_to_sh0
    from threedgrut_tpu.ops.ut import UTConfig

    n, side, cap = 100_000, 800, 100_352
    rng = np.random.default_rng(0)
    pos = np.zeros((cap, 3), np.float32)
    pos[:n, 0:2] = rng.uniform(-2.5, 2.5, (n, 2))
    pos[:n, 2] = rng.uniform(2.0, 9.0, n)
    pos[n:, 2] = 1e6
    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scales = np.log(rng.uniform(0.01, 0.05, (cap, 3)).astype(np.float32))
    dens = (rng.normal(size=(cap, 1)) * 0.5).astype(np.float32)
    albedo = np.asarray(rgb_to_sh0(jnp.asarray(
        rng.uniform(0, 1, (cap, 3)).astype(np.float32))))
    spec = (rng.normal(size=(cap, 45)) * 0.02).astype(np.float32)
    params_d = dict(
        positions=jnp.asarray(pos), rotation=jnp.asarray(quat),
        scale=jnp.asarray(scales), density=jnp.asarray(dens),
        features_albedo=jnp.asarray(albedo),
        features_specular=jnp.asarray(spec))
    model = GaussianState(
        params=GaussianParams(**params_d),
        n_active=jnp.asarray(n, jnp.int32),
        n_active_features=jnp.asarray(3, jnp.int32),
        config=GaussianModelConfig())
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    return model, cam, UTConfig(), side


def main():
    from threedgrut_tpu.ops.quaternion import quat_normalize, quat_to_rotmat
    from threedgrut_tpu.ops.ut import (tile_min_power_response,
                                       unscented_projection)
    from threedgrut_tpu.ops.ut import sensor_position
    from threedgrut_tpu.render.common import camera_rays_world

    model, cam, ut_cfg, side = build_scene()
    proj = unscented_projection(
        cam, ut_cfg, model.params.positions, model.params.rotation,
        model.get_scale(), model.get_density()[:, 0], model.active_mask())
    proj = jax.tree.map(np.asarray, proj)

    gx = gy = side // TILE
    # --- numpy binning (mirrors ops/binning.py semantics) ---
    lo_x = np.clip(np.floor((proj.center[:, 0] - 0.5 - proj.extent[:, 0]) / TILE), 0, gx)
    lo_y = np.clip(np.floor((proj.center[:, 1] - 0.5 - proj.extent[:, 1]) / TILE), 0, gy)
    hi_x = np.clip(np.ceil((proj.center[:, 0] - 0.5 + proj.extent[:, 0]) / TILE), 0, gx)
    hi_y = np.clip(np.ceil((proj.center[:, 1] - 0.5 + proj.extent[:, 1]) / TILE), 0, gy)
    w = np.maximum(hi_x - lo_x, 0).astype(np.int64)
    h = np.maximum(hi_y - lo_y, 0).astype(np.int64)
    counts = np.where(proj.valid, w * h, 0)
    order = np.argsort(np.where(proj.valid, proj.depth, np.inf),
                       kind="stable")
    counts_s = counts[order]
    total = counts_s.sum()
    print(f"valid particles: {proj.valid.sum()}, bbox pairs: {total}")

    # expand pairs in depth order
    pid = np.repeat(order, counts_s)                       # [P]
    # per-pair tile coordinate
    offs = np.concatenate([[0], np.cumsum(counts_s)])[:-1]
    local = np.arange(total) - np.repeat(offs, counts_s)
    pw = np.repeat(w[order], counts_s)
    tx = (np.repeat(lo_x[order], counts_s)
          + (local % np.maximum(pw, 1))).astype(np.int64)
    ty = (np.repeat(lo_y[order], counts_s)
          + (local // np.maximum(pw, 1))).astype(np.int64)

    # opacity-aware tile culling (same math as the kernel path)
    power = np.asarray(tile_min_power_response(
        jnp.asarray(np.stack([tx, ty], -1), jnp.float32),
        jnp.asarray(proj.conic[pid]), jnp.asarray(proj.opacity[pid]),
        jnp.asarray(proj.center[pid])))
    max_power = np.log(np.maximum(proj.opacity[pid], 1e-30) / (1 / 255.0))
    keep = power < max_power
    pid, tx, ty = pid[keep], tx[keep], ty[keep]
    tile = ty * gx + tx
    srt = np.argsort(tile, kind="stable")
    pid, tile = pid[srt], tile[srt]
    p_total = pid.shape[0]
    tile_start = np.searchsorted(tile, np.arange(gx * gy + 1))
    tcounts = np.diff(tile_start)
    print(f"culled pairs: {p_total}  tiles: {gx*gy}  "
          f"count mean/p50/p90/max: {tcounts.mean():.0f}/"
          f"{np.percentile(tcounts,50):.0f}/{np.percentile(tcounts,90):.0f}/"
          f"{tcounts.max()}")

    # --- per-particle shared-origin operands ---
    rot = np.asarray(quat_to_rotmat(quat_normalize(model.params.rotation)))
    inv_s = 1.0 / np.asarray(model.get_scale())
    m_mat = inv_s[:, :, None] * np.swapaxes(rot, 1, 2)      # [C,3,3]
    origin = np.asarray(sensor_position(cam))
    delta = origin - np.asarray(model.params.positions)
    gro = np.einsum("nij,nj->ni", m_mat, delta)
    dens_all = np.asarray(model.get_density())[:, 0]

    ray_o, ray_d = camera_rays_world(cam)
    ray_d = np.asarray(ray_d)                               # [H,W,3]

    # per-tile dense alpha + stats
    t0 = time.time()
    n_tiles = gx * gy
    # per-pixel T trajectories reduced to per-(granularity, chunk) stats
    # design points: (block_h, block_w, chunk)
    points = [(16, 16, 256), (16, 16, 128), (8, 16, 128), (8, 8, 128),
              (4, 16, 128), (8, 16, 64), (8, 8, 64), (2, 16, 32),
              (4, 16, 32), (4, 16, 64), (16, 16, 64)]
    # aggregate: for each point, visits with/without group exit (aligned
    # segments per-block; lists re-binned per block via bbox intersect)
    agg = {pt: dict(pairs=0, visits=0, visits_exit=0) for pt in points}
    tile_level = dict(real=0, live=0, contrib=0,
                      visits_raw256=0, visits_raw128=0,
                      visits_al256=0, visits_al128=0,
                      visits_exit256=0, visits_exit128=0)

    min_resp = 0.0113
    min_alpha = 1 / 255.0
    max_alpha_c = 0.99
    deg_scale = -4.5 / 9.0 * 2  # degree-2 GG: resp = exp(-0.5 sq)? see hit

    # use ops.hit response for exactness
    from threedgrut_tpu.ops.hit import _GG_SCALE
    s2 = _GG_SCALE[2]

    for t in range(n_tiles):
        s, e = tile_start[t], tile_start[t + 1]
        if e == s:
            continue
        ids = pid[s:e]
        k = ids.shape[0]
        tyy, txx = divmod(t, gx)
        py0, px0 = tyy * TILE, txx * TILE
        d = ray_d[py0:py0 + TILE, px0:px0 + TILE].reshape(-1, 3)  # [256,3]
        a = gro[ids]                                       # [K,3]
        M = m_mat[ids]                                     # [K,3,3]
        b = np.einsum("pj,kij->pki", d, M)                 # [256,K,3]
        c = np.cross(a[None], b)                           # [256,K,3]
        m = (b * b).sum(-1)
        q = (a[None] * b).sum(-1)
        inv_m = 1.0 / np.maximum(m, 1e-30)
        sq = (c * c).sum(-1) * inv_m
        resp = np.exp(s2 * sq)
        dens = dens_all[ids]
        alpha = np.minimum(max_alpha_c, resp * dens[None])
        hit_t = -q * inv_m
        ok = (resp > min_resp) & (alpha > min_alpha) & (hit_t > 0.0)
        alpha = np.where(ok, alpha, 0.0)                   # [256,K]

        # transmittance trajectory
        log1m = np.log1p(-np.minimum(alpha, 0.999999))
        logT = np.concatenate([np.zeros((256, 1)),
                               np.cumsum(log1m, -1)], axis=1)  # [256,K+1]
        T = np.exp(logT)
        live = alpha > 0.0
        contrib = live & (T[:, :-1] >= MIN_T)
        tile_level["real"] += 256 * k
        tile_level["live"] += live.sum()
        tile_level["contrib"] += contrib.sum()

        # tile-level visit counts (current kernel), raw segments:
        # chunks floor(s/CH)..ceil(e/CH), minus early-exited (all-dead)
        for ch, kr, ka, ke in ((256, "visits_raw256", "visits_al256",
                                "visits_exit256"),
                               (128, "visits_raw128", "visits_al128",
                                "visits_exit128")):
            first = s // ch
            nch = -(-e // ch) - first
            tile_level[kr] += nch
            nal = -(-k // ch)
            tile_level[ka] += nal
            # aligned + tile-level early exit: group=256px
            Tmax = T.max(axis=0)                           # [K+1]
            alive_at = Tmax[np.minimum(np.arange(nal) * ch, k)] >= MIN_T
            tile_level[ke] += int(alive_at.sum())

        # sub-block re-binning design points (aligned segments per block,
        # lists = bbox-intersected subset of the tile's list)
        ctr = proj.center[ids]
        ext = proj.extent[ids]
        blo_x = ctr[:, 0] - 0.5 - ext[:, 0]
        bhi_x = ctr[:, 0] - 0.5 + ext[:, 0]
        blo_y = ctr[:, 1] - 0.5 - ext[:, 1]
        bhi_y = ctr[:, 1] - 0.5 + ext[:, 1]
        for (bh, bw, ch) in points:
            nby, nbx = TILE // bh, TILE // bw
            for by in range(nby):
                for bx in range(nbx):
                    x0, x1 = px0 + bx * bw, px0 + (bx + 1) * bw
                    y0, y1 = py0 + by * bh, py0 + (by + 1) * bh
                    sel = ((bhi_x >= x0) & (blo_x < x1)
                           & (bhi_y >= y0) & (blo_y < y1))
                    kk = int(sel.sum())
                    if kk == 0:
                        continue
                    ag = agg[(bh, bw, ch)]
                    ag["pairs"] += kk
                    nch = -(-kk // ch)
                    ag["visits"] += nch
                    # group exit: alpha/T restricted to block pixels AND
                    # the block's own (culled) list
                    rows = np.zeros((TILE, TILE), bool)
                    rows[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = True
                    rows = rows.reshape(-1)
                    al_b = alpha[rows][:, sel]
                    lg = np.concatenate(
                        [np.zeros((al_b.shape[0], 1)),
                         np.cumsum(np.log1p(-np.minimum(al_b, 0.999999)),
                                   -1)], axis=1)
                    Tb = np.exp(lg).max(axis=0)
                    alive = Tb[np.minimum(np.arange(nch) * ch, kk)] >= MIN_T
                    ag["visits_exit"] += int(alive.sum())
        if t % 500 == 0:
            print(f"  tile {t}/{n_tiles}  ({time.time()-t0:.0f}s)",
                  flush=True)

    print(f"\noracle done in {time.time()-t0:.0f}s")
    print(f"\n== tile-level (current kernel) ==")
    r = tile_level
    print(f"real evals {r['real']/1e6:.1f}M  live {r['live']/1e6:.1f}M "
          f"({100*r['live']/r['real']:.1f}%)  contrib {r['contrib']/1e6:.1f}M "
          f"({100*r['contrib']/r['real']:.1f}%)")
    for ch in (256, 128):
        print(f" CHUNK={ch}: raw visits {r[f'visits_raw{ch}']} "
              f"({r[f'visits_raw{ch}']*256*ch/1e6:.0f}M lane-evals), "
              f"aligned {r[f'visits_al{ch}']} "
              f"({r[f'visits_al{ch}']*256*ch/1e6:.0f}M), "
              f"aligned+exit {r[f'visits_exit{ch}']} "
              f"({r[f'visits_exit{ch}']*256*ch/1e6:.0f}M)")

    print(f"\n== sub-block re-binning design points ==")
    print(f"{'block':>8} {'chunk':>5} {'pairs':>9} {'visits':>8} "
          f"{'lane-evals':>10} {'+exit visits':>12} {'exit lane-evals':>15}")
    for (bh, bw, ch) in points:
        ag = agg[(bh, bw, ch)]
        px = bh * bw
        print(f"{bh}x{bw:>3} {ch:>5} {ag['pairs']:>9} {ag['visits']:>8} "
              f"{ag['visits']*px*ch/1e6:>9.0f}M {ag['visits_exit']:>12} "
              f"{ag['visits_exit']*px*ch/1e6:>14.0f}M")


if __name__ == "__main__":
    main()

"""Size the per-pixel early-termination waste in the dense tile model.

The Pallas raster kernel composites [256 px x CHUNK cand] blocks and can
only skip work when ALL 256 rays of a tile are saturated
(cfg.early_exit).  A CUDA pixel thread (reference
threedgut_tracer/src/kernels/splatRaster.cu render loop) breaks out of
the candidate walk per-THREAD, i.e. at warp (32 px) granularity in
practice.  This tool measures, on the exact bench.py workload, how much
(pixel-row x candidate-lane) work each granularity would do:

  tile-256   : what the kernel does today (chunk loop exits when the
               whole tile is dead)
  slab-64    : 4 independent row-groups of 64 consecutive tile rows
               (16x4 pixel slabs) with their own chunk loops
  quad-64    : 8x8 spatial quadrants (needs a row shuffle in pack_rays)
  warp-32    : GPU-warp-equivalent granularity (lower bound for any
               row-group scheme)
  pixel      : per-pixel ideal (sum of termination indices)

Run on CPU; the alpha math reuses ops/hit.py (same semantics as the
kernel's fast path).  Reports lane-visit totals and the implied fwd-time
multiplier at CHUNK=256 and CHUNK=128.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                             GaussianParams, GaussianState)
from threedgrut_tpu.ops import ut as ut_ops
from threedgrut_tpu.ops.cameras import make_pinhole
from threedgrut_tpu.ops.hit import density_hit
from threedgrut_tpu.ops.sh import rgb_to_sh0
from threedgrut_tpu.ops.ut import TILE_X, TILE_Y, UTConfig
from threedgrut_tpu.render.common import camera_rays_world

MIN_T = 1e-4


def bench_scene():
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
    params = GaussianParams(
        positions=jnp.asarray(pos), rotation=jnp.asarray(quat),
        scale=jnp.asarray(scales), density=jnp.asarray(dens),
        features_albedo=jnp.asarray(albedo),
        features_specular=jnp.asarray(spec))
    model = GaussianState(params=params, n_active=jnp.asarray(n, jnp.int32),
                          n_active_features=jnp.asarray(3, jnp.int32),
                          config=GaussianModelConfig())
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    return model, cam, side


def build_pairs(proj, side):
    """Per-tile depth-sorted candidate lists from the projection (numpy
    replica of ops/binning.py bbox expansion, without the per-pair
    power-response refinement -> slightly conservative lists)."""
    gx = (side + TILE_X - 1) // TILE_X
    gy = (side + TILE_Y - 1) // TILE_Y
    valid = np.asarray(proj.valid)
    center = np.asarray(proj.center)
    extent = np.asarray(proj.extent)
    depth = np.asarray(proj.depth)
    idx = np.nonzero(valid)[0]
    x0 = np.clip(((center[idx, 0] - extent[idx, 0]) // TILE_X), 0,
                 gx - 1).astype(np.int64)
    x1 = np.clip(((center[idx, 0] + extent[idx, 0]) // TILE_X), 0,
                 gx - 1).astype(np.int64)
    y0 = np.clip(((center[idx, 1] - extent[idx, 1]) // TILE_Y), 0,
                 gy - 1).astype(np.int64)
    y1 = np.clip(((center[idx, 1] + extent[idx, 1]) // TILE_Y), 0,
                 gy - 1).astype(np.int64)
    counts = (x1 - x0 + 1) * (y1 - y0 + 1)
    order = np.argsort(depth[idx], kind="stable")
    idx, x0, x1, y0, y1, counts = (a[order]
                                   for a in (idx, x0, x1, y0, y1, counts))
    total = int(counts.sum())
    pt = np.empty(total, np.int64)
    pp = np.empty(total, np.int64)
    off = np.concatenate([[0], np.cumsum(counts)])
    for i in range(len(idx)):   # ~100k iterations, fine
        tiles = (np.arange(y0[i], y1[i] + 1)[:, None] * gx
                 + np.arange(x0[i], x1[i] + 1)[None, :]).ravel()
        pt[off[i]:off[i + 1]] = tiles
        pp[off[i]:off[i + 1]] = idx[i]
    # stable sort by tile keeps depth order within each tile
    srt = np.argsort(pt, kind="stable")
    pt, pp = pt[srt], pp[srt]
    starts = np.searchsorted(pt, np.arange(gx * gy))
    ends = np.searchsorted(pt, np.arange(gx * gy) + 1)
    return pp, starts, ends, gx, gy


def main():
    model, cam, side = bench_scene()
    proj = ut_ops.unscented_projection(
        cam, UTConfig(), model.params.positions, model.params.rotation,
        model.get_scale(), model.get_density()[:, 0], model.active_mask())
    pp, starts, ends, gx, gy = build_pairs(proj, side)
    lens = ends - starts
    print(f"tiles={gx * gy} pairs={len(pp)} "
          f"len mean={lens.mean():.0f} p50={np.median(lens):.0f} "
          f"p95={np.percentile(lens, 95):.0f} max={lens.max()}")

    ray_o, ray_d = camera_rays_world(cam)
    ray_o = np.asarray(ray_o)
    ray_d = np.asarray(ray_d)

    pos = np.asarray(model.params.positions)
    quat = np.array(model.params.rotation)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scale = np.asarray(model.get_scale())
    dens = np.asarray(model.get_density())[:, 0]

    def tile_alpha(p_idx, o, d):
        # p_idx [L], o/d [256,3] -> alpha [256, L]
        a = density_hit(o[:, None, :], d[:, None, :],
                        jnp.asarray(pos[p_idx])[None],
                        jnp.asarray(quat[p_idx])[None],
                        jnp.asarray(scale[p_idx])[None],
                        jnp.asarray(dens[p_idx])[None]).alpha
        return a

    LMAX = 512  # pad/truncate lists; >p99 of this scene
    rng = np.random.default_rng(1)
    sample = rng.permutation(gx * gy)[:800]

    term = np.zeros((len(sample), TILE_Y * TILE_X), np.int64)
    efflen = np.zeros(len(sample), np.int64)
    for si, t in enumerate(sample):
        L = int(lens[t])
        Lc = min(L, LMAX)
        p_idx = pp[starts[t]:starts[t] + Lc]
        ty, tx = divmod(int(t), gx)
        o = ray_o[ty * TILE_Y:(ty + 1) * TILE_Y,
                  tx * TILE_X:(tx + 1) * TILE_X].reshape(-1, 3)
        d = ray_d[ty * TILE_Y:(ty + 1) * TILE_Y,
                  tx * TILE_X:(tx + 1) * TILE_X].reshape(-1, 3)
        if Lc == 0:
            continue
        a = np.asarray(tile_alpha(jnp.asarray(p_idx), jnp.asarray(o),
                                  jnp.asarray(d)))
        logt = np.cumsum(np.log1p(-np.minimum(a, 0.999999)), axis=1)
        dead = logt < np.log(MIN_T)
        # termination index: first candidate position with T_excl < MIN_T
        first_dead = np.where(dead.any(axis=1), dead.argmax(axis=1) + 1, L)
        term[si] = np.minimum(first_dead, L)
        efflen[si] = L

    # work accounting (row-lane visits) per scheme
    def chunks(x, c):
        return np.ceil(np.minimum(x, LMAX) / c) * c

    report = {}
    for c in (256, 128):
        tile_w = 256 * chunks(term.max(axis=1), c)
        groups = term.reshape(len(sample), 4, 64)      # slab-64 rows
        slab_w = (64 * chunks(groups.max(axis=2), c)).sum(axis=1)
        # 8x8 quadrants: row p = y*16+x
        yy = np.arange(256) // 16
        xx = np.arange(256) % 16
        qid = (yy // 8) * 2 + (xx // 8)
        quad_w = np.zeros(len(sample))
        for q in range(4):
            quad_w += 64 * chunks(term[:, qid == q].max(axis=1), c)
        warp = term.reshape(len(sample), 8, 32)
        warp_w = (32 * chunks(warp.max(axis=2), c)).sum(axis=1)
        px_w = chunks(term, c).sum(axis=1)
        base = tile_w.sum()
        report[c] = dict(
            tile=1.0, slab64=slab_w.sum() / base,
            quad64=quad_w.sum() / base, warp32=warp_w.sum() / base,
            pixel_chunked=px_w.sum() / base,
            pixel_ideal=term.sum() / base)
        print(f"CHUNK={c}: rel work tile=1.00 "
              f"slab64={report[c]['slab64']:.3f} "
              f"quad64={report[c]['quad64']:.3f} "
              f"warp32={report[c]['warp32']:.3f} "
              f"px(chunked)={report[c]['pixel_chunked']:.3f} "
              f"px(ideal)={report[c]['pixel_ideal']:.3f}")
    nz = efflen > 0
    print(f"term p50={np.median(term[nz].ravel()):.0f} "
          f"p90={np.percentile(term[nz].ravel(), 90):.0f} "
          f"p99={np.percentile(term[nz].ravel(), 99):.0f} "
          f"listlen mean={efflen[nz].mean():.0f}")


if __name__ == "__main__":
    main()

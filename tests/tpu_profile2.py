"""Fine-grained binning stage timing on TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_smoke import build
from threedgrut_tpu.ops import binning as binning_ops
from threedgrut_tpu.ops import ut as ut_ops
from threedgrut_tpu.ops.pallas.raster import CHUNK
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    n = 10
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)
    return out


def main():
    n, side = 100_000, 800
    cam, model = build(n, (side, side))
    ut_cfg = UTConfig()
    gx = (side + 15) // 16
    grid = (gx, gx)
    P = 1 << 21

    proj = jax.jit(lambda p: ut_ops.unscented_projection(
        cam, ut_cfg, p.positions, p.rotation,
        jnp.exp(p.scale), jax.nn.sigmoid(p.density)[:, 0],
        jnp.arange(p.positions.shape[0]) < 100_000))(model.params)
    jax.block_until_ready(proj)

    # stage A: expansion only (counts/order/cummax/decode), no sort
    def stage_a(proj):
        import threedgrut_tpu.ops.binning as B
        gxx, gyy = grid
        num_tiles = gxx * gyy
        inv_tx = 1.0 / 16; inv_ty = 1.0 / 16
        lo_x = jnp.clip(jnp.floor((proj.center[:, 0] - 0.5 - proj.extent[:, 0]) * inv_tx), 0, gxx).astype(jnp.int32)
        lo_y = jnp.clip(jnp.floor((proj.center[:, 1] - 0.5 - proj.extent[:, 1]) * inv_ty), 0, gyy).astype(jnp.int32)
        hi_x = jnp.clip(jnp.ceil((proj.center[:, 0] - 0.5 + proj.extent[:, 0]) * inv_tx), 0, gxx).astype(jnp.int32)
        hi_y = jnp.clip(jnp.ceil((proj.center[:, 1] - 0.5 + proj.extent[:, 1]) * inv_ty), 0, gyy).astype(jnp.int32)
        width = jnp.maximum(hi_x - lo_x, 0)
        height = jnp.maximum(hi_y - lo_y, 0)
        counts = jnp.where(proj.valid, width * height, 0)
        depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
        order = jnp.argsort(depth_key)
        counts_sorted = counts[order]
        offsets = jnp.cumsum(counts_sorted)
        excl = offsets - counts_sorted
        pair_j = jnp.arange(P, dtype=jnp.int32)
        nonempty = counts_sorted > 0
        markers = jnp.zeros(P, jnp.int32).at[jnp.where(nonempty, excl, P)].max(
            jnp.arange(proj.valid.shape[0], dtype=jnp.int32) + 1, mode="drop")
        src = jax.lax.cummax(markers) - 1
        src = jnp.clip(src, 0, proj.valid.shape[0] - 1)
        in_range = pair_j < jnp.minimum(offsets[-1], P)
        rank = pair_j - excl[src]
        w_src = jnp.maximum(width[order][src], 1)
        tx = lo_x[order][src] + rank % w_src
        ty = lo_y[order][src] + rank // w_src
        pair_particle = order[src]
        pair_tile = jnp.where(in_range, ty * gxx + tx, num_tiles)
        return pair_tile, pair_particle

    pt, pp = bench("A expansion (no sort)", stage_a, proj)

    # stage B: the stable pair sort alone
    def stage_b(pt, pp):
        return jax.lax.sort((pt, pp), num_keys=1, is_stable=True)

    spt, spp = bench("B pair sort (stable, 1 key + payload)", stage_b, pt, pp)

    def stage_b2(pt, pp):
        return jax.lax.sort((pt, pp), num_keys=1, is_stable=False)

    bench("B2 pair sort (unstable)", stage_b2, pt, pp)

    def stage_b3(pt, pp):
        key = pt.astype(jnp.int64) * (1 << 22) + jnp.arange(P, dtype=jnp.int64)
        k2, v = jax.lax.sort((key, pp), num_keys=1, is_stable=False)
        return v

    bench("B3 pair sort (fused i64 key, unstable)", stage_b3, pt, pp)

    # stage C: culling math per pair
    def stage_c(pt, pp):
        tile_xy = jnp.stack([pt % gx, pt // gx], -1).astype(jnp.float32)
        power = ut_ops.tile_min_power_response(
            tile_xy, proj.conic[pp], proj.opacity[pp], proj.center[pp])
        max_power = jnp.log(jnp.maximum(proj.opacity[pp], 1e-30) * 255.0)
        return jnp.where(power < max_power, pt, gx * gx)

    bench("C culling per pair", stage_c, pt, pp)

    # stage D: aligned scatter
    def stage_d(spt, spp):
        num_tiles = gx * gx
        raw_start = jnp.searchsorted(spt, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left").astype(jnp.int32)
        counts = raw_start[1:] - raw_start[:-1]
        padded = ((counts + CHUNK - 1) // CHUNK) * CHUNK
        aligned_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)])
        p_total = P + num_tiles * CHUNK
        pj = jnp.arange(P, dtype=jnp.int32)
        tc = jnp.minimum(spt, num_tiles - 1)
        dest = jnp.where(spt < num_tiles, aligned_start[tc] + pj - raw_start[tc], p_total)
        return jnp.full(p_total, -1, jnp.int32).at[dest].set(spp, mode="drop")

    ap = bench("D aligned scatter", stage_d, spt, spp)

    # stage E: record gather + chunk transpose (shared-origin, 16 rows)
    def stage_e(ap, params):
        idx = jnp.maximum(ap, 0)
        pv = (ap >= 0).astype(jnp.float32)[:, None]
        p_total = ap.shape[0]
        recs = jnp.concatenate([
            params.positions[idx], params.rotation[idx],
            jnp.exp(params.scale)[idx],
            jax.nn.sigmoid(params.density)[idx] * pv,
            params.features_albedo[idx],
            jnp.zeros((p_total, 2), jnp.float32)], axis=1)
        return recs.reshape(p_total // CHUNK, CHUNK, 16).transpose(0, 2, 1)

    bench("E record gather+transpose", stage_e, ap, model.params)


if __name__ == "__main__":
    main()

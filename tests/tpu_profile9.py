"""Component timing v9: separate per-program overhead from math in the
raster kernels (same compiled program, data-only variants)."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
from tpu_smoke import build
from threedgrut_tpu.ops import binning as binning_ops, ut as ut_ops
from threedgrut_tpu.ops.pallas.raster import (CHUNK, RasterKernelConfig,
                                              rasterize_tiles)
from threedgrut_tpu.ops.quaternion import quat_normalize, quat_to_rotmat
from threedgrut_tpu.ops.ut import UTConfig, sensor_position
from threedgrut_tpu.render.common import RasterConfig, camera_rays_world
from threedgrut_tpu.render.gut import pack_rays, _scene_aabb, _ray_aabb


def bench(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    n, side = 100_000, 800
    cam, model = build(n, (side, side))
    ut_cfg = UTConfig(); rc = RasterConfig(max_pairs=1 << 20)
    gx = (side + 15) // 16; grid = (gx, gx)

    proj = jax.jit(lambda p: ut_ops.unscented_projection(
        cam, ut_cfg, p.positions, p.rotation, jnp.exp(p.scale),
        jax.nn.sigmoid(p.density)[:, 0],
        jnp.arange(p.positions.shape[0]) < n))(model.params)
    b = jax.jit(lambda pr: binning_ops.bin_particles(
        pr, grid, rc.max_pairs, chunk=CHUNK))(proj)
    jax.block_until_ready(b)

    kcfg = RasterKernelConfig()
    idx = jnp.maximum(b.pair_particle, 0)
    pv = (b.pair_particle >= 0).astype(jnp.float32)[:, None]
    p_total = idx.shape[0]

    quats = quat_normalize(model.params.rotation)
    origin = sensor_position(cam)
    rot = quat_to_rotmat(quats)
    inv_s = 1.0 / jnp.exp(model.params.scale)
    m_mat = inv_s[:, :, None] * jnp.swapaxes(rot, 1, 2)
    delta = origin - model.params.positions
    gro = jnp.einsum("nij,nj->ni", m_mat, delta, precision="highest")
    feats = jnp.abs(model.params.features_albedo)
    recs = jnp.concatenate([
        gro[idx], m_mat.reshape(-1, 9)[idx],
        jax.nn.sigmoid(model.params.density)[idx] * pv, feats[idx]], axis=1)
    records = recs.reshape(p_total // CHUNK, CHUNK,
                           kcfg.record_dim).transpose(0, 2, 1)
    jax.block_until_ready(records)

    ray_o, ray_d = camera_rays_world(cam)
    lo, hi = _scene_aabb(model)
    tmin, tmax = _ray_aabb(ray_o, ray_d, lo, hi)
    rays_packed = pack_rays(ray_o, ray_d, tmin, tmax, grid)
    tile_count = b.tile_start[1:] - b.tile_start[:-1]
    tile_start = b.tile_start[:-1]
    num_tiles = int(tile_start.shape[0])
    live = int(jax.device_get(jnp.sum(tile_count)))
    print(f"tiles={num_tiles} live_pairs={live} "
          f"chunks={records.shape[0]}", flush=True)

    def raster_fwd(recs, ts, tc):
        return rasterize_tiles(recs, ts, tc, rays_packed, kcfg, False)

    def raster_bwd(recs, ts, tc):
        return jax.grad(lambda r: jnp.sum(
            raster_fwd(r, ts, tc)[:, :, 0:5]))(recs)

    zc = jnp.zeros_like(tile_count)
    # uniform full-chunk segments, same total chunk-iterations
    n_chunks_live = (live + CHUNK - 1) // CHUNK
    per_tile = max(1, n_chunks_live // num_tiles)
    uni_count = np.full(num_tiles, per_tile * CHUNK, np.int64)
    extra = n_chunks_live - per_tile * num_tiles
    uni_count[:max(0, extra)] += CHUNK
    uni_start = np.concatenate([[0], np.cumsum(uni_count)[:-1]])
    uni_start = jnp.asarray(np.minimum(uni_start, p_total - CHUNK),
                            dtype=tile_start.dtype)
    uni_count = jnp.asarray(uni_count, dtype=tile_count.dtype)

    bench("fwd real segments", raster_fwd, records, tile_start, tile_count)
    bench("fwd zero segments (pure program overhead)",
          raster_fwd, records, tile_start, zc)
    bench("fwd uniform chunk-aligned segments",
          raster_fwd, records, uni_start, uni_count)
    bench("bwd real segments", raster_bwd, records, tile_start, tile_count)
    bench("bwd zero segments", raster_bwd, records, tile_start, zc)


if __name__ == "__main__":
    main()

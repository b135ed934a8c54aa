"""Component timing v4: isolate backward-path pieces."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
from tpu_smoke import build
from threedgrut_tpu.ops import binning as binning_ops, ut as ut_ops
from threedgrut_tpu.ops.pallas.raster import CHUNK, RasterKernelConfig, rasterize_tiles
from threedgrut_tpu.ops.quaternion import quat_normalize, quat_to_rotmat
from threedgrut_tpu.ops.ut import UTConfig, sensor_position
from threedgrut_tpu.render.common import RasterConfig, camera_rays_world
from threedgrut_tpu.render.gut import pack_rays, _scene_aabb, _ray_aabb


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)
    return out


def main():
    n, side = 100_000, 800
    cam, model = build(n, (side, side))
    ut_cfg = UTConfig(); rc = RasterConfig(max_pairs=1 << 20)
    gx = (side + 15) // 16; grid = (gx, gx)

    # precompute binning ONCE (static inputs for kernel-only benchmarks)
    proj = jax.jit(lambda p: ut_ops.unscented_projection(
        cam, ut_cfg, p.positions, p.rotation, jnp.exp(p.scale),
        jax.nn.sigmoid(p.density)[:, 0],
        jnp.arange(p.positions.shape[0]) < n))(model.params)
    b = jax.jit(lambda pr: binning_ops.bin_particles(pr, grid, rc.max_pairs, chunk=CHUNK))(proj)
    jax.block_until_ready(b)

    kcfg = RasterKernelConfig()
    idx = jnp.maximum(b.pair_particle, 0)
    pv = (b.pair_particle >= 0).astype(jnp.float32)[:, None]
    p_total = idx.shape[0]

    def build_records(params):
        quats = quat_normalize(params.rotation)
        origin = sensor_position(cam)
        rot = quat_to_rotmat(quats)
        inv_s = 1.0 / jnp.exp(params.scale)
        m_mat = inv_s[:, :, None] * jnp.swapaxes(rot, 1, 2)
        delta = origin - params.positions
        gro = jnp.einsum("nij,nj->ni", m_mat, delta, precision="highest")
        feats = jnp.abs(params.features_albedo)  # stand-in for SH eval
        recs = jnp.concatenate([
            gro[idx], m_mat.reshape(-1, 9)[idx],
            jax.nn.sigmoid(params.density)[idx] * pv, feats[idx]], axis=1)
        return recs.reshape(p_total // CHUNK, CHUNK, kcfg.record_dim).transpose(0, 2, 1)

    records = jax.jit(build_records)(model.params)
    jax.block_until_ready(records)

    ray_o, ray_d = camera_rays_world(cam)
    lo, hi = _scene_aabb(model)
    tmin, tmax = _ray_aabb(ray_o, ray_d, lo, hi)
    rays_packed = pack_rays(ray_o, ray_d, tmin, tmax, grid)
    tile_count = b.tile_start[1:] - b.tile_start[:-1]
    tile_start = b.tile_start[:-1]

    bench("records build fwd", build_records, model.params)
    bench("records build fwd+bwd (gather transpose = scatter-add)",
          jax.grad(lambda p: jnp.sum(build_records(p))), model.params)

    def raster_fwd(recs):
        return rasterize_tiles(recs, tile_start, tile_count, rays_packed, kcfg, False)

    bench("raster kernel fwd", raster_fwd, records)
    bench("raster kernel fwd+bwd",
          jax.grad(lambda r: jnp.sum(raster_fwd(r)[:, :, 0:5])), records)


if __name__ == "__main__":
    main()

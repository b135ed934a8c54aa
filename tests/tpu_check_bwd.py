"""Real-TPU backward-kernel parity vs interpret-mode emulation.

Validates the compiled Mosaic backward (DMA pipelining, RMW boundary
accumulation, dynamic-slot buffering) against the interpret-mode run of
the same kernel code on a small scene. Not run by pytest (needs a TPU).

Usage: python tests/tpu_check_bwd.py
"""
import sys
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


def main():
    n, side = 3000, 128
    cam, model = build(n, (side, side), seed=3)
    ut_cfg = UTConfig(); rc = RasterConfig(max_pairs=1 << 16)
    gx = (side + 15) // 16; grid = (gx, gx)

    proj = jax.jit(lambda p: ut_ops.unscented_projection(
        cam, ut_cfg, p.positions, p.rotation, jnp.exp(p.scale),
        jax.nn.sigmoid(p.density)[:, 0],
        jnp.arange(p.positions.shape[0]) < n))(model.params)
    b = jax.jit(lambda pr: binning_ops.bin_particles(
        pr, grid, rc.max_pairs, chunk=CHUNK))(proj)

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
        jax.nn.sigmoid(model.params.density)[idx] * pv, feats[idx]],
        axis=1)
    records = recs.reshape(p_total // CHUNK, CHUNK,
                           kcfg.record_dim).transpose(0, 2, 1)

    ray_o, ray_d = camera_rays_world(cam)
    lo, hi = _scene_aabb(model)
    tmin, tmax = _ray_aabb(ray_o, ray_d, lo, hi)
    rays_packed = pack_rays(ray_o, ray_d, tmin, tmax, grid)
    tile_count = b.tile_start[1:] - b.tile_start[:-1]
    tile_start = b.tile_start[:-1]

    def loss(recs, interpret):
        out = rasterize_tiles(recs, tile_start, tile_count, rays_packed,
                              kcfg, interpret)
        return jnp.sum(out[:, :, 0:5] * (1.0 + 0.1 * jnp.arange(5)))

    fwd_tpu = jax.jit(lambda r: loss(r, False))(records)
    fwd_int = jax.jit(lambda r: loss(r, True))(records)
    g_tpu = jax.jit(jax.grad(lambda r: loss(r, False)))(records)
    g_int = jax.jit(jax.grad(lambda r: loss(r, True)))(records)
    g_tpu, g_int = np.asarray(g_tpu), np.asarray(g_int)
    scale = np.abs(g_int).max() + 1e-12
    err = np.abs(g_tpu - g_int).max() / scale
    print(f"fwd tpu={float(fwd_tpu):.6g} interpret={float(fwd_int):.6g} "
          f"rel_diff={abs(float(fwd_tpu-fwd_int))/abs(float(fwd_int)):.2e}")
    print(f"bwd max rel err vs interpret: {err:.3e} "
          f"(nonzero tpu={int((g_tpu!=0).sum())}, "
          f"int={int((g_int!=0).sum())})")
    assert np.isfinite(g_tpu).all()
    assert err < 2e-3, "backward kernel mismatch vs interpret emulation"
    print("OK")


if __name__ == "__main__":
    main()

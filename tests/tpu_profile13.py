"""Early-exit cost experiment: raster fwd/bwd pallas with and without
the all-dead early-exit check (outputs identical by construction).

Run: python tests/tpu_profile13.py
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
    from threedgrut_tpu.render.common import RasterConfig, camera_rays_world
    from threedgrut_tpu.ops.pallas.raster import (
        CHUNK, RasterKernelConfig, _pallas_backward, rasterize_tiles)
    from threedgrut_tpu.ops.quaternion import quat_normalize, quat_to_rotmat
    from threedgrut_tpu.ops.sh import eval_sh_radiance
    from threedgrut_tpu.ops.ut import sensor_position
    from threedgrut_tpu.render.gut import _ray_aabb, _scene_aabb, pack_rays

    params_d, model = make_state()
    side = 800
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    ut_cfg = UTConfig()
    rc = RasterConfig(max_pairs=86 * 8192)
    gx = gy = side // 16

    m = model.replace(params=model.params.replace(**params_d))
    proj = jax.jit(lambda: ut_ops.unscented_projection(
        cam, ut_cfg, m.params.positions, m.params.rotation,
        m.get_scale(), m.get_density()[:, 0], m.active_mask()))()
    b = jax.jit(lambda: binning_ops.bin_particles(
        proj, (gx, gy), rc.max_pairs, chunk=CHUNK))()

    @jax.jit
    def build():
        feats = jnp.maximum(
            eval_sh_radiance(m.sh_coeffs(), proj.view_dir, 3), 0.0)
        quats = quat_normalize(m.params.rotation)
        origin = sensor_position(cam)
        rot = quat_to_rotmat(quats)
        inv_s = 1.0 / m.get_scale()
        m_mat = inv_s[:, :, None] * jnp.swapaxes(rot, 1, 2)
        gro = jnp.einsum("nij,nj->ni", m_mat,
                         origin - m.params.positions, precision="highest")
        table = jnp.concatenate(
            [gro, m_mat.reshape(-1, 9), m.get_density(), feats], axis=1)
        records = table[b.pair_particle]
        n_chunks = records.shape[0] // CHUNK
        records = records.reshape(n_chunks, CHUNK, 16).transpose(0, 2, 1)
        ray_o, ray_d = camera_rays_world(cam)
        lo, hi = _scene_aabb(m)
        tmin, tmax = _ray_aabb(ray_o, ray_d, lo, hi)
        return records, pack_rays(ray_o, ray_d, tmin, tmax, (gx, gy))

    records, rays = build()
    tile_count = b.tile_start[1:] - b.tile_start[:-1]
    tile_start = b.tile_start[:-1]

    for ee in (True,):
        kcfg = RasterKernelConfig(early_exit=ee)
        fwd_out = t(f"fwd early_exit={ee}",
                    lambda r: rasterize_tiles(r, tile_start, tile_count,
                                              rays, kcfg, False), records)
        g_out = jnp.ones_like(fwd_out) * 1e-3
        t(f"bwd early_exit={ee}",
          lambda r: _pallas_backward(r, tile_start, tile_count, rays,
                                     fwd_out, g_out, kcfg, False), records)
    # cross-check identical outputs
    a = rasterize_tiles(records, tile_start, tile_count, rays,
                        RasterKernelConfig(early_exit=True), False)
    c = rasterize_tiles(records, tile_start, tile_count, rays,
                        RasterKernelConfig(early_exit=False), False)
    print("fwd outputs equal:",
          bool(jnp.max(jnp.abs(a - c)) == 0.0))


if __name__ == "__main__":
    main()

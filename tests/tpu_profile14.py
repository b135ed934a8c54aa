"""Binning internals + rays-pack timing at the bench workload.

Run: python tests/tpu_profile14.py
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
    from threedgrut_tpu.ops.ut import TILE_X, TILE_Y, UTConfig
    from threedgrut_tpu.ops.pallas.expand import (BLK, SLAB,
                                                  expand_decode_pairs)
    from threedgrut_tpu.render.common import RasterConfig, camera_rays_world
    from threedgrut_tpu.render.gut import _ray_aabb, _scene_aabb, pack_rays

    params_d, model = make_state()
    side = 800
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    m = model.replace(params=model.params.replace(**params_d))
    ut_cfg = UTConfig()
    max_pairs = 86 * 8192
    gx = gy = side // 16
    proj = jax.jit(lambda: ut_ops.unscented_projection(
        cam, ut_cfg, m.params.positions, m.params.rotation,
        m.get_scale(), m.get_density()[:, 0], m.active_mask()))()

    # full binning with and without perm carry
    t("binning carry_perm=True",
      lambda p: binning_ops.bin_particles(p, (gx, gy), max_pairs,
                                          chunk=256, carry_perm=True), proj)
    t("binning carry_perm=False",
      lambda p: binning_ops.bin_particles(p, (gx, gy), max_pairs,
                                          chunk=256, carry_perm=False), proj)

    # stage: depth argsort of 100k
    def depth_sort(p):
        key = jnp.where(p.valid, p.depth, jnp.inf)
        return jnp.argsort(key)

    order = t("depth argsort [100k]", depth_sort, proj)

    # stage: the tile sort alone (3-operand, 704k)
    b = binning_ops.bin_particles(proj, (gx, gy), max_pairs, chunk=256,
                                  carry_perm=True)
    pt = jnp.asarray(np.random.default_rng(0).integers(
        0, 2501, max_pairs, dtype=np.int32))
    pp = jnp.arange(max_pairs, dtype=jnp.int32) % 100000
    iota = jnp.arange(max_pairs, dtype=jnp.int32)

    t("tile sort 3-op [704k]",
      lambda a, c, d: jax.lax.sort((a, c, d), num_keys=1, is_stable=True),
      pt, pp, iota)
    t("tile sort 2-op [704k]",
      lambda a, c: jax.lax.sort((a, c), num_keys=1, is_stable=True),
      pt, pp)

    # stage: argsort(perm) (the fold-backward inverse)
    t("argsort(perm) [704k]", lambda x: jnp.argsort(x), b.perm)

    # rays: generation + aabb + tile packing
    def rays_fn():
        ray_o, ray_d = camera_rays_world(cam)
        lo, hi = _scene_aabb(m)
        tmin, tmax = _ray_aabb(ray_o, ray_d, lo, hi)
        return pack_rays(ray_o, ray_d, tmin, tmax, (gx, gy))

    t("rays gen+aabb+pack", rays_fn)

    # table build + gather split
    from threedgrut_tpu.ops.quaternion import quat_normalize, quat_to_rotmat
    from threedgrut_tpu.ops.sh import eval_sh_radiance
    from threedgrut_tpu.ops.ut import sensor_position

    def table_fn():
        feats = jnp.maximum(
            eval_sh_radiance(m.sh_coeffs(), proj.view_dir, 3), 0.0)
        quats = quat_normalize(m.params.rotation)
        rot = quat_to_rotmat(quats)
        inv_s = 1.0 / m.get_scale()
        m_mat = inv_s[:, :, None] * jnp.swapaxes(rot, 1, 2)
        gro = jnp.einsum("nij,nj->ni", m_mat,
                         sensor_position(cam) - m.params.positions,
                         precision="highest")
        return jnp.concatenate(
            [gro, m_mat.reshape(-1, 9), m.get_density(), feats], axis=1)

    table = t("table build (SH+canonical)", table_fn)

    def gather_fn(tb):
        recs = tb[b.pair_particle]
        return recs.reshape(-1, 256, 16).transpose(0, 2, 1)

    t("gather+retile [704k x 16]", gather_fn, table)


if __name__ == "__main__":
    main()

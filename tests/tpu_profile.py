"""Staged timing of the 3DGUT forward pipeline on TPU (not run by pytest)."""
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
from threedgrut_tpu.ops.ut import TILE_X, TILE_Y, UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    n = 10
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms")
    return out


def main():
    n, side = 100_000, 800
    cam, model = build(n, (side, side))
    ut_cfg = UTConfig()
    rc = RasterConfig(max_pairs=1 << 21)
    gx = (side + 15) // 16
    grid = (gx, gx)

    def proj_fn(params):
        m = model.replace(params=params)
        return ut_ops.unscented_projection(
            cam, ut_cfg, m.params.positions, m.params.rotation,
            m.get_scale(), m.get_density()[:, 0], m.active_mask())

    proj = bench("1 projection", proj_fn, model.params)

    def bin_fn(params):
        p = proj_fn(params)
        return binning_ops.bin_particles(p, grid, rc.max_pairs, chunk=CHUNK,
                                         alpha_threshold=ut_cfg.alpha_threshold)

    b = bench("2 proj+binning", bin_fn, model.params)

    def bin_nocull(params):
        p = proj_fn(params)
        return binning_ops.bin_particles(p, grid, rc.max_pairs, chunk=CHUNK,
                                         tile_culling=False,
                                         alpha_threshold=ut_cfg.alpha_threshold)

    bench("2b proj+binning(no cull)", bin_nocull, model.params)

    def full_fn(params):
        m = model.replace(params=params)
        return render_gut(cam, ut_cfg, rc, m, sh_degree=3)

    out = bench("3 full forward", full_fn, model.params)
    print("   pairs:", int(out["num_pairs"]))

    # smaller pair budget
    rc2 = RasterConfig(max_pairs=1 << 20)

    def full_small(params):
        m = model.replace(params=params)
        return render_gut(cam, ut_cfg, rc2, m, sh_degree=3)

    out = bench("4 full fwd (P=1M)", full_small, model.params)
    print("   pairs:", int(out["num_pairs"]), "ovf:", int(out["pairs_overflow"]))


if __name__ == "__main__":
    main()

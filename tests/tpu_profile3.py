"""Component timing v3: forward pieces + backward pieces on TPU."""
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
from threedgrut_tpu.ops.ssim import ssim
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)
    return out


def main():
    n, side = 100_000, 800
    cam, model = build(n, (side, side))
    ut_cfg = UTConfig()
    rc = RasterConfig(max_pairs=1 << 20)
    gx = (side + 15) // 16
    grid = (gx, gx)
    gt = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (side, side, 3)).astype(np.float32))

    def fwd(params):
        m = model.replace(params=params)
        return render_gut(cam, ut_cfg, rc, m, sh_degree=3)

    bench("full forward", fwd, model.params)

    def bin_only(params):
        m = model.replace(params=params)
        proj = ut_ops.unscented_projection(
            cam, ut_cfg, m.params.positions, m.params.rotation,
            m.get_scale(), m.get_density()[:, 0], m.active_mask())
        return binning_ops.bin_particles(proj, grid, rc.max_pairs,
                                         chunk=CHUNK)

    bench("proj+binning", bin_only, model.params)

    def loss_l1_only(params):
        m = model.replace(params=params)
        out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
        return jnp.mean(jnp.abs(out["pred_features"] - gt))

    bench("fwd+bwd (L1 only)", jax.grad(loss_l1_only), model.params)

    def loss_full(params):
        m = model.replace(params=params)
        out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
        pred = out["pred_features"]
        return 0.8 * jnp.mean(jnp.abs(pred - gt)) + 0.2 * (
            1 - ssim(pred.transpose(2, 0, 1)[None],
                     gt.transpose(2, 0, 1)[None]))

    bench("fwd+bwd (L1+SSIM)", jax.grad(loss_full), model.params)

    def ssim_only(pred):
        return ssim(pred.transpose(2, 0, 1)[None],
                    gt.transpose(2, 0, 1)[None])

    bench("ssim fwd+bwd", jax.grad(ssim_only), gt * 0.9)


if __name__ == "__main__":
    main()

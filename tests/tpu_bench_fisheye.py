"""Fisheye (ScanNet++-style OpenCV fisheye) 3DGUT train it/s on chip.

Same synthetic 100k/800x800 workload as bench.py but projected through
an OPENCV_FISHEYE camera (4-term radial theta-polynomial, the ScanNet++
capture convention, reference sensors/cameraProjections.cuh:96-147).
Exercises the fisheye UT projection + distortion inversion in the full
train step; recorded in NOTES.md (VERDICT r2 item 5).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_bench2 import make_state
    from threedgrut_tpu.ops.cameras import make_fisheye
    from threedgrut_tpu.ops.ssim import ssim
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.optimizers.adam import adam_step, init_adam_state
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut

    params_d, model = make_state()
    side, cap = 800, 100_352
    cam = make_fisheye(resolution=(side, side),
                       focal=(0.55 * side, 0.55 * side),
                       principal=(side / 2, side / 2),
                       radial4=(0.06, -0.01, 0.002, 0.0),
                       max_angle=1.2)
    ut_cfg = UTConfig()
    rc = RasterConfig(
        max_pairs=96 * 8192,
        records_bf16=bool(int(os.environ.get("FE_RECORDS_BF16", "0"))),
        exact_kill=False)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))
    opt_state = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    active = jnp.arange(cap, dtype=jnp.int32) < model.n_active

    def one_step(pd, opt):
        def loss_fn(p):
            m = model.replace(params=model.params.replace(**p))
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            pred = out["pred_features"]
            l1 = jnp.mean(jnp.abs(pred - gt))
            s = ssim(pred.transpose(2, 0, 1)[None],
                     gt.transpose(2, 0, 1)[None])
            return 0.8 * l1 + 0.2 * (1.0 - s)
        loss, grads = jax.value_and_grad(loss_fn)(pd)
        np_, no_ = adam_step(pd, grads, opt, lrs, update_mask=active)
        return np_, no_, loss

    @jax.jit
    def ten_steps(pd, opt):
        def body(carry, _):
            pd, opt = carry
            pd, opt, loss = one_step(pd, opt)
            return (pd, opt), loss
        (pd, opt), losses = jax.lax.scan(body, (pd, opt), None, length=10)
        return pd, opt, losses

    pd, opt, losses = ten_steps(params_d, opt_state)
    jax.block_until_ready(losses)
    t0 = time.time()
    n_dispatch = 5
    for _ in range(n_dispatch):
        pd, opt, losses = ten_steps(pd, opt)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    its = 10 * n_dispatch / dt
    print(json.dumps({
        "metric": "3dgut_fisheye_train_iters_per_sec_100k_800px",
        "value": round(its, 2), "unit": "it/s"}))


if __name__ == "__main__":
    main()

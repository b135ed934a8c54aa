"""Secondary benchmark: 3DGRT (sorted compositing, kernel degree 4)
train iterations/sec at the bench workload (100k gaussians, 800x800).

Reference anchor: 3DGRT NeRF-Synthetic trains 30k iters in 479.3 s on an
RTX 5090 ~= 62.6 it/s (BASELINE.md). Not the driver metric (bench.py is)
- run manually; the result is recorded in NOTES.md / README.md.
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

BASELINE_IT_S = 62.6


def main():
    from tpu_bench2 import make_state
    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.ops.ssim import ssim
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.optimizers.adam import adam_step, init_adam_state
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.grt import render_grt

    params_d, model = make_state()
    side, cap = 800, 100_352
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    ut_cfg = UTConfig()
    # defaults mirror configs/render/3dgrt.yaml (round-3 adoption)
    rc = RasterConfig(max_pairs=86 * 8192,
                      sort_window=int(os.environ.get("GRT_SORT_WINDOW",
                                                     "16")),
                      records_bf16=bool(int(os.environ.get(
                          "GRT_RECORDS_BF16", "0"))),
                      exact_kill=bool(int(os.environ.get(
                          "GRT_EXACT_KILL", "0"))),
                      sort_skip_dead=bool(int(os.environ.get(
                          "GRT_SKIP_DEAD", "1"))))
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))
    opt_state = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    active = jnp.arange(cap, dtype=jnp.int32) < model.n_active

    if os.environ.get("GRT_QUALITY"):
        # image fidelity of the windowed per-ray sort vs full-chunk
        # ordering (the widest window the kernel supports) on this scene
        from threedgrut_tpu.ops.pallas.raster import CHUNK

        def frame(window):
            m = model.replace(params=model.params.replace(**params_d))
            out = render_grt(cam, ut_cfg, rc.replace(sort_window=window),
                             m, sh_degree=3)
            return out["pred_features"]

        ref = np.asarray(jax.jit(frame, static_argnums=0)(CHUNK))
        img = np.asarray(jax.jit(frame, static_argnums=0)(rc.sort_window))
        mse = float(np.mean((ref - img) ** 2))
        print(json.dumps({
            "metric": "3dgrt_sort_window_psnr_vs_fullchunk",
            "window": rc.sort_window,
            "value": round(10 * np.log10(1.0 / max(mse, 1e-12)), 2),
            "unit": "dB"}))

    def one_step(pd, opt):
        def loss_fn(p):
            m = model.replace(params=model.params.replace(**p))
            out = render_grt(cam, ut_cfg, rc, m, sh_degree=3)
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
        "metric": "3dgrt_train_iters_per_sec_100k_800px",
        "value": round(its, 2), "unit": "it/s",
        "vs_baseline": round(its / BASELINE_IT_S, 4)}))


if __name__ == "__main__":
    main()

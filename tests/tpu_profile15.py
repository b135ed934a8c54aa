"""Round-2 stage timing + lever matrix at the bench workload.

Measures the current (strip-kernel) stage breakdown, then the sized
levers: records_bf16, exact_kill=False, and their combination.

Run: python tests/tpu_profile15.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
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
    sys.path.insert(0, "/root/repo/tests")
    from tpu_bench2 import make_state

    from threedgrut_tpu.ops import binning as binning_ops
    from threedgrut_tpu.ops import ut as ut_ops
    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.ops.ssim import ssim
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.optimizers.adam import adam_step, init_adam_state
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut

    params_d, model = make_state()
    side, cap = 800, 100_352
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    ut_cfg = UTConfig()
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))
    opt = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    active = jnp.arange(cap, dtype=jnp.int32) < model.n_active

    def proj_fn(pd):
        m = model.replace(params=model.params.replace(**pd))
        return ut_ops.unscented_projection(
            cam, ut_cfg, m.params.positions, m.params.rotation,
            m.get_scale(), m.get_density()[:, 0], m.active_mask())

    only = os.environ.get("THREEDGRUT_VARIANTS")
    only = set(only.split(",")) if only else None

    def variant(tag, rc):
        if only is not None and tag not in only:
            return
        out = jax.jit(lambda pd: render_gut(
            cam, ut_cfg, rc, model.replace(
                params=model.params.replace(**pd)),
            sh_degree=3)["pairs_overflow"])(params_d)
        print(f"[{tag}] pairs_overflow={int(out)}", flush=True)
        def fwd(pd):
            m = model.replace(params=model.params.replace(**pd))
            return render_gut(cam, ut_cfg, rc, m,
                              sh_degree=3)["pred_features"]

        def fwdbwd(pd):
            def loss(p):
                m = model.replace(params=model.params.replace(**p))
                out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
                return jnp.mean(jnp.abs(out["pred_features"] - gt))
            return jax.grad(loss)(pd)

        def train_step(pd, opt_state):
            def loss_fn(p):
                m = model.replace(params=model.params.replace(**p))
                out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
                pred = out["pred_features"]
                l1 = jnp.mean(jnp.abs(pred - gt))
                s = ssim(pred.transpose(2, 0, 1)[None],
                         gt.transpose(2, 0, 1)[None])
                return 0.8 * l1 + 0.2 * (1.0 - s)
            loss, grads = jax.value_and_grad(loss_fn)(pd)
            np_, no_ = adam_step(pd, grads, opt_state, lrs,
                                 update_mask=active)
            return np_, no_, loss

        t(f"[{tag}] render fwd", fwd, params_d)
        t(f"[{tag}] render fwd+bwd (L1)", fwdbwd, params_d)
        t(f"[{tag}] train step", train_step, params_d, opt, n=10)

    base = RasterConfig(max_pairs=768 * 1024)
    proj = t("projection", proj_fn, params_d)
    gx = gy = side // 16

    def bin_fn(p):
        return binning_ops.bin_particles(p, (gx, gy), base.max_pairs,
                                         chunk=256, carry_perm=True)
    t("binning+perm", bin_fn, proj)

    variant("base", base)
    variant("bf16", base.replace(records_bf16=True))
    variant("nokill", base.replace(exact_kill=False))
    variant("bf16+nokill", base.replace(records_bf16=True,
                                        exact_kill=False))
    # aligned segments need budget headroom for the chunk padding
    # (measured on this scene: aligned_total 945,408 @CHUNK=256 /
    # 782,336 @128 on 600,431 raw pairs)
    from threedgrut_tpu.ops.pallas.raster import CHUNK
    ali_pairs = (120 if CHUNK == 256 else 100) * 8192
    ali = base.replace(aligned_segments=True, max_pairs=ali_pairs)
    variant("aligned", ali)
    variant("aligned+bf16+nokill", ali.replace(records_bf16=True,
                                               exact_kill=False))


if __name__ == "__main__":
    main()

"""Stage timing at the current bench workload (post suffix-bwd + fold).

Run: python tests/tpu_profile8.py
"""
import sys, os, time
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
    rc = RasterConfig(max_pairs=768 * 1024)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))

    # stage 1: projection
    def proj_fn(pd):
        m = model.replace(params=model.params.replace(**pd))
        return ut_ops.unscented_projection(
            cam, ut_cfg, m.params.positions, m.params.rotation,
            m.get_scale(), m.get_density()[:, 0], m.active_mask())
    proj = t("projection", proj_fn, params_d)

    # stage 2: binning (with perm carry)
    gx = gy = side // 16
    def bin_fn(p):
        return binning_ops.bin_particles(p, (gx, gy), rc.max_pairs,
                                         chunk=256, carry_perm=True)
    t("binning+perm", bin_fn, proj)

    # full forward
    def fwd(pd):
        m = model.replace(params=model.params.replace(**pd))
        return render_gut(cam, ut_cfg, rc, m, sh_degree=3)["pred_features"]
    t("render fwd total", fwd, params_d)

    # fwd + bwd
    def fwdbwd(pd):
        def loss(p):
            m = model.replace(params=model.params.replace(**p))
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            return jnp.mean(jnp.abs(out["pred_features"] - gt))
        return jax.grad(loss)(pd)
    t("render fwd+bwd (L1 only)", fwdbwd, params_d)

    # ssim fwd+bwd
    pred = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))
    def ssim_fb(p):
        return jax.grad(lambda x: ssim(x.transpose(2, 0, 1)[None],
                                       gt.transpose(2, 0, 1)[None]))(p)
    t("ssim fwd+bwd", ssim_fb, pred)

    # adam
    opt = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    grads = jax.tree.map(lambda x: x * 1e-4, params_d)
    active = jnp.arange(cap, dtype=jnp.int32) < model.n_active
    t("adam step", lambda p, g, o: adam_step(p, g, o, lrs,
                                             update_mask=active),
      params_d, grads, opt)

    # full train step (= bench config)
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
        np_, no_ = adam_step(pd, grads, opt_state, lrs, update_mask=active)
        return np_, no_, loss
    t("train step (1-step jit)", train_step, params_d, opt, n=10)


if __name__ == "__main__":
    main()

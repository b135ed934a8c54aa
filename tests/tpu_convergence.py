"""End-to-end training convergence on real TPU hardware.

Teacher-student: render ground truth from a hidden 'true' Gaussian scene
with the production renderer, train a randomly-initialized student
through the full Pallas forward/backward + Adam, and report test-view
PSNR over time. Validates kernel gradients numerically on hardware (the
CPU suite runs the same math in interpreter mode).

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tests/tpu_convergence.py
"""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np

from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                             GaussianParams, GaussianState)
from threedgrut_tpu.ops.cameras import make_pinhole
from threedgrut_tpu.ops.sh import rgb_to_sh0
from threedgrut_tpu.ops.ssim import psnr, ssim
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.optimizers.adam import adam_step, init_adam_state
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut

SIDE = 400
CAP = 20_480
N_TRUE = 4_000
N_STUDENT = 12_000
STEPS = 1500
UT = UTConfig()
RC = RasterConfig(max_pairs=1 << 18)


def build_state(n, cap, seed, tight):
    rng = np.random.default_rng(seed)
    pos = np.zeros((cap, 3), np.float32)
    pos[:, 2] = 1e6
    pos[:n, 0:2] = rng.uniform(-1.5, 1.5, (n, 2))
    pos[:n, 2] = rng.uniform(2.5, 6.0, n)
    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    lo, hi = (0.03, 0.10) if tight else (0.05, 0.15)
    scales = np.log(rng.uniform(lo, hi, (cap, 3)).astype(np.float32))
    dens = (rng.normal(size=(cap, 1)) * 0.5 + (1.0 if tight else 0.0)
            ).astype(np.float32)
    albedo = np.asarray(rgb_to_sh0(jnp.asarray(
        rng.uniform(0, 1, (cap, 3)).astype(np.float32))))
    spec = (rng.normal(size=(cap, 45)) * (0.05 if tight else 0.01)
            ).astype(np.float32)
    params = GaussianParams(
        positions=jnp.asarray(pos), rotation=jnp.asarray(quat),
        scale=jnp.asarray(scales), density=jnp.asarray(dens),
        features_albedo=jnp.asarray(albedo),
        features_specular=jnp.asarray(spec))
    return GaussianState(params=params, n_active=jnp.asarray(n, jnp.int32),
                         n_active_features=jnp.asarray(3, jnp.int32),
                         config=GaussianModelConfig())


def main():
    teacher = build_state(N_TRUE, CAP, seed=0, tight=True)
    student = build_state(N_STUDENT, CAP, seed=1, tight=False)

    # cameras: orbit of 8 train views + 1 held-out test view
    cams = []
    for k in range(9):
        t = np.zeros(3, np.float32)
        t[0] = 0.8 * np.sin(2 * np.pi * k / 9)
        t[1] = 0.4 * np.cos(2 * np.pi * k / 9)
        cams.append(make_pinhole(
            resolution=(SIDE, SIDE), focal=(1.1 * SIDE, 1.1 * SIDE),
            principal=(SIDE / 2, SIDE / 2),
            t=jnp.asarray(t), q=jnp.asarray([1.0, 0, 0, 0])))
    test_cam, train_cams = cams[-1], cams[:-1]

    render = jax.jit(lambda cam, m: render_gut(cam, UT, RC, m,
                                               sh_degree=3))
    t0 = time.time()
    gts = [jnp.clip(render(c, teacher)["pred_features"], 0, 1)
           for c in cams]
    jax.block_until_ready(gts)
    print(f"GT renders: {time.time()-t0:.1f}s", flush=True)

    params_d = dict(positions=student.params.positions,
                    rotation=student.params.rotation,
                    scale=student.params.scale,
                    density=student.params.density,
                    features_albedo=student.params.features_albedo,
                    features_specular=student.params.features_specular)
    opt_state = init_adam_state(params_d)
    lrs = {"positions": 1.6e-4 * 4.0, "rotation": 1e-3, "scale": 5e-3,
           "density": 5e-2, "features_albedo": 2.5e-3,
           "features_specular": 1.25e-4}
    lrs = {k: jnp.asarray(v, jnp.float32) for k, v in lrs.items()}

    base = student

    @jax.jit
    def step(params_d, opt_state, cam, gt):
        def loss_fn(pd):
            m = base.replace(params=base.params.replace(**pd))
            out = render_gut(cam, UT, RC, m, sh_degree=3)
            pred = out["pred_features"]
            l1 = jnp.mean(jnp.abs(pred - gt))
            s = ssim(pred.transpose(2, 0, 1)[None],
                     gt.transpose(2, 0, 1)[None])
            return 0.8 * l1 + 0.2 * (1.0 - s)
        loss, grads = jax.value_and_grad(loss_fn)(params_d)
        active = jnp.arange(CAP, dtype=jnp.int32) < base.n_active
        new_p, new_o = adam_step(params_d, grads, opt_state, lrs,
                                 update_mask=active)
        return new_p, new_o, loss

    def test_psnr(params_d):
        m = base.replace(params=base.params.replace(**params_d))
        pred = jnp.clip(render(test_cam, m)["pred_features"], 0, 1)
        return float(psnr(pred, gts[-1]))

    print(f"step 0: test PSNR {test_psnr(params_d):.2f} dB", flush=True)
    t0 = time.time()
    for i in range(STEPS):
        cam = train_cams[i % len(train_cams)]
        params_d, opt_state, loss = step(params_d, opt_state, cam,
                                         gts[i % len(train_cams)])
        if (i + 1) % 300 == 0:
            jax.block_until_ready(loss)
            print(f"step {i+1}: loss {float(loss):.4f} "
                  f"test PSNR {test_psnr(params_d):.2f} dB "
                  f"({(i+1)/(time.time()-t0):.1f} it/s)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()

"""Train the playground's learned CNN denoiser.

The reference ships a pretrained AI denoiser via OptiX
(threedgrut_playground/src/hybridTracer.cpp:503); no weights can be
downloaded in this environment (zero egress), so the equivalent network
is trained HERE, on procedurally generated playground scenes:

  * scene = a random colored Gaussian cloud + 1-2 mirror/glass/PBR
    icospheres over a ground box, random constant envmap,
  * noisy input  = 1 SPP render with depth-of-field aperture sampling
    and independent-random subpixel jitter (the playground's actual
    Monte-Carlo noise sources),
  * clean target = the SAME scene and camera accumulated to --spp-ref
    samples.

Pairs are cached under --data (regenerating them dominates the cost);
training is a plain Adam/L1+grad-loss loop on random crops. Weights
land at threedgrut_tpu/playground/denoiser_weights.npz (committed) and
are picked up by playground.denoise_cnn.denoise_frame.

Usage:
  python scripts/train_denoiser.py --scenes 16 --side 96 --steps 600
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def random_scene(rng, n=220):
    import jax.numpy as jnp

    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 GaussianParams,
                                                 GaussianState)
    from threedgrut_tpu.ops.sh import rgb_to_sh0
    from threedgrut_tpu.playground.engine import (Engine3DGRUT,
                                                  EngineConfig,
                                                  EnvironmentMap,
                                                  PBRMaterial)
    from threedgrut_tpu.playground.mesh import make_box, make_icosphere

    cap = 256
    pos = np.zeros((cap, 3), np.float32)
    pos[:n] = rng.uniform(-0.9, 0.9, (n, 3))
    pos[:n, 1] = rng.uniform(-0.3, 0.8, n)
    pos[n:, 2] = 1e6
    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scale = np.log(rng.uniform(0.03, 0.12, (cap, 3)).astype(np.float32))
    dens = rng.normal(size=(cap, 1)).astype(np.float32) * 0.6 + 0.5
    albedo = np.asarray(rgb_to_sh0(jnp.asarray(
        rng.uniform(0.05, 0.95, (cap, 3)).astype(np.float32))))
    model = GaussianState(
        params=GaussianParams(
            positions=jnp.asarray(pos), rotation=jnp.asarray(quat),
            scale=jnp.asarray(scale), density=jnp.asarray(dens),
            features_albedo=jnp.asarray(albedo),
            features_specular=jnp.zeros((cap, 45), jnp.float32)),
        n_active=jnp.asarray(n, jnp.int32),
        n_active_features=jnp.asarray(3, jnp.int32),
        config=GaussianModelConfig())

    cfg = EngineConfig(
        max_bounces=3, spp=1, spp_mode="independent_random",
        aperture=float(rng.uniform(0.04, 0.14)),
        focus_distance=float(rng.uniform(2.4, 3.6)),
        gaussian_sh_degree=0)
    env = EnvironmentMap(constant=tuple(rng.uniform(0.2, 0.9, 3)))
    eng = Engine3DGRUT(model, cfg, env)
    kinds = ["mirror", "glass", "pbr"]
    for _ in range(int(rng.integers(1, 3))):
        kind = kinds[int(rng.integers(0, 3))]
        mat = PBRMaterial(
            kind=kind, base_color=tuple(rng.uniform(0.3, 0.9, 3)),
            roughness=float(rng.uniform(0.05, 0.5)),
            metallic=float(rng.uniform(0.0, 1.0)),
            ior=1.45)
        c = rng.uniform(-0.6, 0.6, 3)
        c[1] = rng.uniform(-0.1, 0.5)
        eng.add_primitive(
            make_icosphere(c, float(rng.uniform(0.18, 0.35)),
                           subdivisions=1), mat)
    eng.add_primitive(make_box((0.0, -0.55, 0.0), (2.4, 0.1, 2.4)),
                      PBRMaterial(kind="diffuse",
                                  base_color=(0.6, 0.6, 0.6)))
    return eng


def render_pair(eng, rng, side, spp_ref):
    import jax

    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.render.common import camera_rays_world
    from threedgrut_tpu.train.trainer import camera_from_batch
    from threedgrut_tpu.data.protocols import Batch
    from threedgrut_tpu.ops.ut import UTConfig

    az = rng.uniform(0, 2 * np.pi)
    el = np.deg2rad(rng.uniform(10, 40))
    radius = rng.uniform(2.6, 3.4)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_synthetic_scene import camera_pose
    c2w = camera_pose(az, el, radius)
    cv = c2w.copy()
    cv[:3, 1] *= -1
    cv[:3, 2] *= -1
    b = Batch(rays_ori=np.zeros((side, side, 3), np.float32),
              rays_dir=np.zeros((side, side, 3), np.float32),
              T_to_world=cv.astype(np.float32),
              intrinsics=[1.1 * side, 1.1 * side, side / 2, side / 2])
    cam = camera_from_batch(b, UTConfig())

    seed = int(rng.integers(0, 2 ** 31 - 1))
    noisy = eng.render(cam, key=jax.random.PRNGKey(seed))
    eng.config.spp = spp_ref
    clean = eng.render(cam, key=jax.random.PRNGKey(seed + 1))
    eng.config.spp = 1
    return np.asarray(noisy), np.asarray(clean)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--side", type=int, default=96)
    ap.add_argument("--spp-ref", type=int, default=24)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--data", default="runs/denoiser_pairs.npz")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from threedgrut_tpu.playground import denoise_cnn

    rng = np.random.default_rng(7)
    if os.path.exists(args.data):
        blob = np.load(args.data)
        noisy, clean = blob["noisy"], blob["clean"]
        print(f"loaded {len(noisy)} cached pairs from {args.data}",
              flush=True)
    else:
        noisy, clean = [], []
        for s in range(args.scenes):
            eng = random_scene(rng)
            n, c = render_pair(eng, rng, args.side, args.spp_ref)
            noisy.append(n)
            clean.append(c)
            print(f"scene {s + 1}/{args.scenes} rendered "
                  f"(noise rms {np.sqrt(np.mean((n - c) ** 2)):.4f})",
                  flush=True)
        noisy = np.stack(noisy)
        clean = np.stack(clean)
        os.makedirs(os.path.dirname(args.data), exist_ok=True)
        np.savez_compressed(args.data, noisy=noisy, clean=clean)

    # --- train ---
    params = denoise_cnn.init_params(jax.random.PRNGKey(0), guides=False)
    import optax
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, x, y):
        out = denoise_cnn.apply_cnn(p, x)
        l1 = jnp.mean(jnp.abs(out - y))
        # edge preservation: match finite-difference gradients too
        gx = jnp.mean(jnp.abs((out[:, :, 1:] - out[:, :, :-1])
                              - (y[:, :, 1:] - y[:, :, :-1])))
        gy = jnp.mean(jnp.abs((out[:, 1:] - out[:, :-1])
                              - (y[:, 1:] - y[:, :-1])))
        return l1 + 0.5 * (gx + gy)

    @jax.jit
    def step(p, o, x, y):
        l, g = jax.value_and_grad(loss_fn)(p, x, y)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    side, crop = noisy.shape[1], args.crop
    base_mse = float(np.mean((noisy - clean) ** 2))
    for it in range(args.steps):
        idx = rng.integers(0, len(noisy), args.batch)
        ys = rng.integers(0, side - crop + 1, args.batch)
        xs = rng.integers(0, side - crop + 1, args.batch)
        xb = np.stack([noisy[i, y:y + crop, x:x + crop]
                       for i, y, x in zip(idx, ys, xs)])
        yb = np.stack([clean[i, y:y + crop, x:x + crop]
                       for i, y, x in zip(idx, ys, xs)])
        params, opt_state, l = step(params, opt_state,
                                    jnp.asarray(xb), jnp.asarray(yb))
        if (it + 1) % 100 == 0:
            print(f"step {it + 1}: loss {float(l):.5f}", flush=True)

    out_mse = float(np.mean(np.asarray(
        (denoise_cnn.apply_cnn(params, jnp.asarray(noisy))
         - clean) ** 2)))
    print(f"full-set MSE noisy={base_mse:.6f} denoised={out_mse:.6f} "
          f"({10 * np.log10(base_mse / max(out_mse, 1e-12)):.2f} dB gain)",
          flush=True)
    denoise_cnn.save_params(params, args.out or denoise_cnn.WEIGHTS_PATH)
    print("saved:", args.out or denoise_cnn.WEIGHTS_PATH)


if __name__ == "__main__":
    main()

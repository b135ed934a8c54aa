"""Real-TPU smoke + timing for the 3DGUT pipeline (not run by pytest).

Usage: python tests/tpu_smoke.py [n_particles] [side]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                             GaussianParams, GaussianState)
from threedgrut_tpu.ops.cameras import make_pinhole
from threedgrut_tpu.ops.sh import rgb_to_sh0
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut


def build(n, res, seed=0, cap=None):
    rng = np.random.default_rng(seed)
    cap = cap or n
    pos = np.zeros((cap, 3), np.float32)
    pos[:n, 0:2] = rng.uniform(-2.5, 2.5, (n, 2))
    pos[:n, 2] = rng.uniform(2.0, 9.0, n)
    pos[n:, 2] = 1e6
    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scales = np.log(rng.uniform(0.01, 0.05, (cap, 3)).astype(np.float32))
    dens = rng.normal(size=(cap, 1)).astype(np.float32) * 0.5
    albedo = np.asarray(rgb_to_sh0(jnp.asarray(
        rng.uniform(0, 1, (cap, 3)).astype(np.float32))))
    spec = (rng.normal(size=(cap, 45)) * 0.02).astype(np.float32)
    cfg = GaussianModelConfig()
    params = GaussianParams(
        positions=jnp.asarray(pos), rotation=jnp.asarray(quat),
        scale=jnp.asarray(scales), density=jnp.asarray(dens),
        features_albedo=jnp.asarray(albedo), features_specular=jnp.asarray(spec))
    model = GaussianState(params=params, n_active=jnp.asarray(n, jnp.int32),
                          n_active_features=jnp.asarray(3, jnp.int32),
                          config=cfg)
    w, h = res
    cam = make_pinhole(resolution=res, focal=(1.1 * w, 1.1 * w),
                       principal=(w / 2, h / 2))
    return cam, model


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    max_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 21)
    print(f"devices: {jax.devices()}")
    cam, model = build(n, (side, side))
    ut_cfg = UTConfig()
    rc = RasterConfig(max_pairs=max_pairs)

    @jax.jit
    def fwd(params):
        m = model.replace(params=params)
        return render_gut(cam, ut_cfg, rc, m, sh_degree=3)

    @jax.jit
    def fwd_bwd(params):
        def loss(p):
            m = model.replace(params=p)
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            return jnp.mean(jnp.abs(out["pred_features"] - 0.5)), out
        (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        return l, out, g

    t0 = time.time()
    out = fwd(model.params)
    jax.block_until_ready(out)
    print(f"fwd compile+run: {time.time()-t0:.1f}s  pairs={int(out['num_pairs'])} overflow={int(out['pairs_overflow'])}")
    img = np.asarray(out["pred_features"])
    print(f"img mean={img.mean():.4f} opacity mean={np.asarray(out['pred_opacity']).mean():.4f} hits mean={np.asarray(out['hits_count']).mean():.2f}")

    for trial in range(3):
        t0 = time.time()
        for _ in range(10):
            out = fwd(model.params)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        print(f"fwd: {dt*1000:.2f} ms/frame  ({1/dt:.1f} FPS)")

    t0 = time.time()
    r = fwd_bwd(model.params)
    jax.block_until_ready(r)
    print(f"fwd+bwd compile+run: {time.time()-t0:.1f}s  loss={float(r[0]):.4f}")
    for trial in range(3):
        t0 = time.time()
        for _ in range(10):
            r = fwd_bwd(model.params)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 10
        print(f"fwd+bwd: {dt*1000:.2f} ms/iter  ({1/dt:.1f} it/s)")
    g = r[2]
    print("grad finite:", all(bool(jnp.all(jnp.isfinite(x))) for x in
                              jax.tree.leaves(g)))


if __name__ == "__main__":
    main()

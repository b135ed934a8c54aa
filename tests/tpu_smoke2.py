"""TPU compile/run smoke for the round's new kernel variants:
weight telemetry and the shared-segment (trace) backward.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tests/tpu_smoke2.py
"""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
from tpu_smoke import build
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut
from threedgrut_tpu.render.grt import trace


def main():
    n, side = 100_000, 800
    cam, model = build(n, (side, side))
    ut = UTConfig()
    rc = RasterConfig(max_pairs=1 << 20)

    t0 = time.time()
    wfn = jax.jit(lambda m: render_gut(cam, ut, rc, m, sh_degree=3,
                                       weight_telemetry=True))
    out = wfn(model)
    jax.block_until_ready(out)
    w = np.asarray(out["particle_wmax"])
    print(f"weight telemetry: compile+run {time.time()-t0:.1f}s, "
          f"nonzero={int((w > 0).sum())}, max={w.max():.4f}", flush=True)
    t0 = time.time()
    for _ in range(5):
        out = wfn(model)
    jax.block_until_ready(out)
    print(f"weight telemetry steady: {(time.time()-t0)/5*1000:.1f} ms",
          flush=True)

    # trace backward (shared segments) on a small ray batch
    rng = np.random.default_rng(0)
    ro = jnp.zeros((1024, 3))
    d = rng.normal(size=(1024, 3)) * 0.15 + np.array([0, 0, 1.0])
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                     jnp.float32)

    def loss(density):
        m = model.replace(params=model.params.replace(density=density))
        out = trace(m, ro, rd, sh_degree=0)
        return jnp.sum(out["pred_features"])

    t0 = time.time()
    g = jax.jit(jax.grad(loss))(model.params.density)
    jax.block_until_ready(g)
    gn = np.asarray(g)
    print(f"trace bwd: compile+run {time.time()-t0:.1f}s, "
          f"|g| finite={np.isfinite(gn).all()}, "
          f"nonzero={int((gn != 0).sum())}", flush=True)


if __name__ == "__main__":
    main()

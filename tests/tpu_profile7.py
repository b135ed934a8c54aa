"""Component timing v7: fill-kernel internals, pre-stage pieces, fixed
searchsorted + matmul SSIM.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tests/tpu_profile7.py
"""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
from tpu_smoke import build
from threedgrut_tpu.ops import binning as binning_ops, ut as ut_ops
from threedgrut_tpu.ops.pallas.fill import forward_fill, SLAB
from threedgrut_tpu.ops.ut import UTConfig


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    n, side = 100_000, 800
    cam, model = build(n, (side, side))
    ut_cfg = UTConfig(); MP = 1 << 20
    gx = (side + 15) // 16; grid = (gx, gx)
    rng = np.random.default_rng(0)

    proj = jax.jit(lambda p: ut_ops.unscented_projection(
        cam, ut_cfg, p.positions, p.rotation, jnp.exp(p.scale),
        jax.nn.sigmoid(p.density)[:, 0],
        jnp.arange(p.positions.shape[0]) < n))(model.params)
    jax.block_until_ready(proj)

    bench("binning TOTAL (post searchsorted fix)",
          lambda pr: binning_ops.bin_particles(pr, grid, MP, chunk=128), proj)

    # --- fill internals --------------------------------------------------
    cap = model.params.positions.shape[0]
    vals11 = jnp.asarray(rng.normal(size=(cap, 11)).astype(np.float32))
    slots = jnp.asarray(np.sort(rng.choice(MP, cap, replace=False))
                        .astype(np.int32))

    def scatter_set(v, s):
        flat = jnp.zeros((MP, 12), jnp.float32)
        rows = jnp.concatenate([v, jnp.ones((cap, 1), jnp.float32)], axis=1)
        return flat.at[s].set(rows, mode="drop")

    flat = bench("  scatter-set 100k rows -> 1Mx12", scatter_set,
                 vals11, slots)
    slabs = bench("  reshape/transpose to slabs",
                  lambda f: f.reshape(MP // SLAB, SLAB, 12)
                  .transpose(0, 2, 1), flat)
    bench("  forward_fill pallas alone", forward_fill, slabs)

    # alternative: searchsorted src + gather
    excl = jnp.asarray(np.sort(rng.integers(0, MP, cap)).astype(np.int32))
    bench("  alt: searchsorted 1M into 100k (scan_unrolled)",
          lambda e: jnp.searchsorted(e, jnp.arange(MP, dtype=jnp.int32),
                                     side="right",
                                     method="scan_unrolled"), excl)
    src = jnp.asarray(rng.integers(0, cap, MP).astype(np.int32))
    bench("  alt: gather 1Mx11 from 100k", lambda v, s: v[s], vals11, src)

    # --- pre pieces -------------------------------------------------------
    depth = jnp.asarray(rng.normal(size=cap).astype(np.float32))
    bench("  argsort 100k f32", lambda d: jnp.argsort(d), depth)
    order = jnp.argsort(depth)
    bench("  11x gather [order] + stack", lambda v, o: jnp.stack(
        [v[o, i] for i in range(11)], axis=1), vals11, order)
    bench("  gather rows [order] then pass", lambda v, o: v[o], vals11,
          order)

    # --- ssim matmul version ----------------------------------------------
    from threedgrut_tpu.ops.ssim import ssim
    a = jnp.asarray(rng.uniform(0, 1, (1, 3, side, side)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (1, 3, side, side)).astype(np.float32))
    bench("ssim fwd 800px (matmul blur)", ssim, a, b)
    bench("ssim fwd+bwd 800px (matmul blur)",
          lambda x, y: jax.grad(lambda u: ssim(u, y))(x), a, b)


if __name__ == "__main__":
    main()

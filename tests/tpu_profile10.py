"""Layout probe: is elementwise math over [C, k<128] arrays paying
128-lane padding on TPU? Times a fused adam-like update over different
shapes of identical logical size."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np


def t(name, fn, *args, n=50):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.3f} ms", flush=True)


def adamish(p, g, m, v):
    m2 = 0.9 * m + 0.1 * g
    v2 = 0.999 * v + 0.001 * g * g
    p2 = p - 1e-3 * m2 / (jnp.sqrt(v2) + 1e-15)
    return p2, m2, v2


def main():
    c = 100_352
    for shape in [(c, 3), (c, 4), (c, 45), (c * 3,), (3, c), (c, 128)]:
        rng = np.random.default_rng(0)
        arrs = [jnp.asarray(rng.normal(size=shape).astype(np.float32))
                for _ in range(4)]
        t(f"adamish {shape}", adamish, *arrs)

    # full masked update over all 6 leaves, 2D layout (current)
    leaves = {k: s for k, s in [("pos", (c, 3)), ("rot", (c, 4)),
                                ("scale", (c, 3)), ("dens", (c, 1)),
                                ("alb", (c, 3)), ("spec", (c, 45))]}
    rng = np.random.default_rng(1)
    P = {k: jnp.asarray(rng.normal(size=s).astype(np.float32))
         for k, s in leaves.items()}
    G = {k: jnp.asarray(rng.normal(size=s).astype(np.float32))
         for k, s in leaves.items()}
    M = {k: jnp.zeros(s, jnp.float32) for k, s in leaves.items()}
    V = {k: jnp.zeros(s, jnp.float32) for k, s in leaves.items()}
    mask = jnp.asarray(rng.uniform(size=(c,)) < 0.7)

    def full2d(P, G, M, V):
        out = {}
        for k in P:
            p2, m2, v2 = adamish(P[k], G[k], M[k], V[k])
            mk = mask.reshape((-1,) + (1,) * (P[k].ndim - 1))
            out[k] = (jnp.where(mk, p2, P[k]), jnp.where(mk, m2, M[k]),
                      jnp.where(mk, v2, V[k]))
        return out
    t("full masked 2D dict", full2d, P, G, M, V)

    # flattened variant
    Pf = {k: v.reshape(-1) for k, v in P.items()}
    Gf = {k: v.reshape(-1) for k, v in G.items()}
    Mf = {k: v.reshape(-1) for k, v in M.items()}
    Vf = {k: v.reshape(-1) for k, v in V.items()}
    masks = {k: jnp.repeat(mask, leaves[k][1]) for k in leaves}

    def full1d(P, G, M, V):
        out = {}
        for k in P:
            p2, m2, v2 = adamish(P[k], G[k], M[k], V[k])
            mk = masks[k]
            out[k] = (jnp.where(mk, p2, P[k]), jnp.where(mk, m2, M[k]),
                      jnp.where(mk, v2, V[k]))
        return out
    t("full masked 1D dict", full1d, Pf, Gf, Mf, Vf)


if __name__ == "__main__":
    main()

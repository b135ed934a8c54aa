"""Component timing v11: the gradient-fold backward path pieces
(_grf_bwd): argsort(perm), the un-permute gather, the interval fold,
and the rank->particle re-gather."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np


def t(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    from threedgrut_tpu.ops.pallas.fold import fold_sorted_intervals

    mp = 86 * 8192
    cap = 100_352
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(mp).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(mp, 16)).astype(np.float32))
    # synthetic contiguous intervals: each particle owns ~mp/cap slots
    bounds = np.linspace(0, mp, cap + 1).astype(np.int32)
    rank_slot = jnp.asarray(bounds[:-1])
    rank_next = jnp.asarray(bounds[1:])
    pair_rank = jnp.asarray(
        np.searchsorted(bounds[1:], np.arange(mp), side="right")
        .astype(np.float32))
    rank_particle = jnp.asarray(rng.permutation(cap).astype(np.int32))

    t("argsort(perm) [768k]", lambda p: jnp.argsort(p), perm)
    inv_pm = jnp.argsort(perm)
    t("g[inv_pm] gather [768k x 16]", lambda gg, i: gg[i], g, inv_pm)
    pre = g[inv_pm]
    t("fold_sorted_intervals", lambda p, r, s, nx: fold_sorted_intervals(
        p, r, s, nx, interpret=False), pre, pair_rank, rank_slot, rank_next)
    d_rank = fold_sorted_intervals(pre, pair_rank, rank_slot, rank_next)
    t("argsort(rank_particle) [100k]", lambda p: jnp.argsort(p),
      rank_particle)
    inv_rank = jnp.argsort(rank_particle)
    t("d_rank[inv_rank] [100k x 16]", lambda d, i: d[i], d_rank, inv_rank)

    def full(gg):
        ip = jnp.argsort(perm)
        pr = gg[ip]
        dr = fold_sorted_intervals(pr, pair_rank, rank_slot, rank_next)
        return dr[jnp.argsort(rank_particle)]
    t("full _grf_bwd chain", full, g)


if __name__ == "__main__":
    main()

"""Component timing v5: gradient-fold (scatter) strategy shootout.

The records-gather VJP (d_table = zeros.at[idx].add(d_rows), 1M x 16 into
100k x 16) costs ~21 ms on v5e. Candidate replacements, all enabled by the
fact that pre-tile-sort pair order is depth-segment-contiguous:

  A. status quo:        scatter-add with duplicate indices
  B. unique scatter:    un-permute d_rows to pre-sort order (perm is a
                        bijection) then cumsum + segment-boundary gathers
  C. sorted segsum:     un-permute + jax.ops.segment_sum(sorted ids)
  D. raw primitives:    1M x 16 gather / unique-set scatter / cumsum alone

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tests/tpu_profile5.py
"""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    P, CAP, R = 1 << 20, 100_352, 16
    rng = np.random.default_rng(0)
    # synthetic but realistic: ~10 pairs/particle, segment-contiguous in
    # pre-sort order, then a random tile-sort permutation
    seg_ids = np.sort(rng.integers(0, CAP, P)).astype(np.int32)
    perm = rng.permutation(P).astype(np.int32)   # sorted slot -> pre slot
    idx_sorted = seg_ids[perm]                   # what the kernel sees
    d_rows = rng.normal(size=(P, R)).astype(np.float32) * 1e-3

    ids = jnp.asarray(idx_sorted)
    seg = jnp.asarray(seg_ids)
    pm = jnp.asarray(perm)
    dr = jnp.asarray(d_rows)
    inv_pm = jnp.asarray(np.argsort(perm).astype(np.int32))

    # segment boundaries in pre-sort order (excl starts per particle)
    starts = np.searchsorted(seg_ids, np.arange(CAP)).astype(np.int32)
    ends = np.searchsorted(seg_ids, np.arange(CAP) + 1).astype(np.int32)
    st, en = jnp.asarray(starts), jnp.asarray(ends)

    def route_a(dr):
        return jnp.zeros((CAP, R), jnp.float32).at[ids].add(dr)

    def route_b(dr):
        pre = jnp.zeros((P, R), jnp.float32).at[pm].set(
            dr, unique_indices=True)
        cs = jnp.cumsum(pre, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, R)), cs], axis=0)
        return cs[en] - cs[st]

    def route_b2(dr):   # gather-based un-permute instead of scatter
        pre = dr[inv_pm]
        cs = jnp.cumsum(pre, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, R)), cs], axis=0)
        return cs[en] - cs[st]

    def route_c(dr):
        pre = dr[inv_pm]
        return jax.ops.segment_sum(pre, seg, num_segments=CAP,
                                   indices_are_sorted=True)

    a = bench("A scatter-add dup", route_a, dr)
    b2 = bench("B2 gather+cumsum-diff", route_b2, dr)
    b = bench("B uniq-scatter+cumsum-diff", route_b, dr)
    c = bench("C sorted segment_sum", route_c, dr)

    bench("raw gather 1Mx16", lambda d: d[inv_pm], dr)
    bench("raw uniq scatter 1Mx16",
          lambda d: jnp.zeros((P, R), jnp.float32).at[pm].set(
              d, unique_indices=True), dr)
    bench("raw cumsum 1Mx16", lambda d: jnp.cumsum(d, axis=0), dr)
    bench("raw argsort 1M (inv perm build)",
          lambda p: jnp.argsort(p), pm)

    err = lambda x: float(jnp.max(jnp.abs(x - a)) / (jnp.max(jnp.abs(a)) + 1e-12))
    print(f"B2 vs A max rel err: {err(b2):.2e}")
    print(f"C  vs A max rel err: {err(c):.2e}")


if __name__ == "__main__":
    main()

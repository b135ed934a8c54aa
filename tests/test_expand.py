"""Interval-mask matmul expansion kernel vs a numpy reference."""

import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.ops.pallas.expand import BLK, expand_sorted_rows


def run_case(counts, max_pairs, slab, d=11, seed=0):
    rng = np.random.default_rng(seed)
    n = len(counts)
    vals = rng.normal(size=(n, d)).astype(np.float32)
    offsets = np.cumsum(counts)
    excl = offsets - counts

    slot = np.minimum(excl, max_pairs).astype(np.float32)
    nxt = np.minimum(offsets, max_pairs).astype(np.float32)
    n_rows = ((n + BLK - 1) // BLK) * BLK + BLK
    table = np.zeros((n_rows, 128), np.float32)
    table[:n, :d] = vals
    table[:n, 11] = slot
    table[:n, 12] = nxt

    n_slabs = max_pairs // slab
    bounds = np.arange(n_slabs)
    src_start = np.searchsorted(np.minimum(offsets, max_pairs),
                                bounds * slab, side="right")
    src_end = np.searchsorted(np.minimum(excl, max_pairs),
                              (bounds + 1) * slab, side="left")

    out = expand_sorted_rows(
        jnp.asarray(table), jnp.asarray(src_start, jnp.int32),
        jnp.asarray(src_end, jnp.int32), n_slabs, slab=slab,
        interpret=True)
    got = np.asarray(out)[:, :d, :].transpose(0, 2, 1).reshape(max_pairs, d)

    ref = np.zeros((max_pairs, d), np.float32)
    for i in range(n):
        a, b = int(excl[i]), int(min(offsets[i], max_pairs))
        if a < b:
            ref[a:b] = vals[i]
    return got, ref


class TestExpand:
    def test_basic_segments(self):
        counts = np.array([3, 0, 5, 1, 0, 7, 120, 2, 0, 0, 4] + [0] * 50)
        got, ref = run_case(counts, max_pairs=256, slab=256)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_multi_slab_and_overflow(self):
        rng = np.random.default_rng(3)
        counts = rng.integers(0, 9, 300)
        counts[120] = 700          # interval spanning multiple slabs
        # total > max_pairs: overflow dropped
        got, ref = run_case(counts, max_pairs=1024, slab=256, seed=3)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_empty_and_all_zero(self):
        got, ref = run_case(np.zeros(64, np.int64), max_pairs=256, slab=256)
        np.testing.assert_allclose(got, 0.0)

    def test_values_exact_passthrough(self):
        # exactly-one-source-per-lane means the matmul is a select: values
        # must round-trip bit-exactly in interpret mode
        counts = np.array([17, 40, 3, 100, 96])
        got, ref = run_case(counts, max_pairs=256, slab=256, seed=9)
        assert (got == ref).all()

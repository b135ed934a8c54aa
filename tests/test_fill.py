"""Segmented forward-fill Pallas kernel."""

import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.ops.pallas.fill import SLAB, segmented_fill_rows


def test_fill_matches_reference():
    rng = np.random.default_rng(0)
    n, d, length = 50, 4, 3 * SLAB + 17
    vals = rng.normal(size=(n, d)).astype(np.float32)
    slots = np.sort(rng.choice(length, size=n, replace=False)).astype(np.int32)
    out = np.asarray(segmented_fill_rows(jnp.asarray(vals),
                                         jnp.asarray(slots), length,
                                         interpret=True))
    # numpy reference
    ref = np.zeros((length, d), np.float32)
    cur = np.zeros(d, np.float32)
    k = 0
    for i in range(length):
        if k < n and slots[k] == i:
            cur = vals[k]
            k += 1
        ref[i] = cur
    np.testing.assert_allclose(out, ref, atol=0)


def test_fill_drops_out_of_range():
    vals = np.asarray([[1.0], [2.0]], np.float32)
    slots = np.asarray([0, 10**9], np.int32)
    out = np.asarray(segmented_fill_rows(jnp.asarray(vals),
                                         jnp.asarray(slots), 64,
                                         interpret=True))
    np.testing.assert_allclose(out[:, 0], 1.0)

"""Segmented forward-fill Pallas kernel.

Propagates the most recent "marked" row of values down a long axis (one
sequential pass with an on-chip carry threaded between slabs via the
TPU's sequential grid execution; XLA's associative_scan equivalent is
slow to compile and does log-passes over HBM).

NOTE: the binning pair expansion now uses the interval-mask matmul
kernel (ops/pallas/expand.py) instead - the scatter-set this kernel
needs to seed segment starts costs ~14 ms for 100k rows into 1M x 12 on
v5e. Kept as a general-purpose primitive.

Layout: vals [n_slabs, D, S] f32 where row D-1 is the mask row
(>0.5 at segment starts). Output: same shape, every lane holding the
values of the last marked lane at or before it (or the initial zeros
before any marker).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 8192  # lanes per grid step (large slabs amortize per-step overhead)


def _fill_kernel(vals_ref, out_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:, :] = jnp.zeros_like(carry)

    # Hillis-Steele "keep last marked" scan along lanes. The float mask
    # rides as the last row of the value block and is updated by the same
    # keep-or-take-shifted rule (where(m, m, shifted_m) == max for 0/1
    # masks), so every concatenate is full-height [D, *] - single-sublane
    # slices trip Mosaic layout limitations.
    filled = vals_ref[0]                  # [D, S]; row D-1: mask
    s = 1
    while s < filled.shape[1]:
        shifted = jnp.concatenate(
            [jnp.zeros_like(filled[:, :s]), filled[:, :-s]], axis=1)
        m = filled[-1:, :]
        filled = jnp.where(m > 0.5, filled, shifted)
        s *= 2

    # lanes before the slab's first marker take the carry
    m = filled[-1:, :]
    filled = jnp.where(m > 0.5, filled, carry[:, :])
    out_ref[0] = filled
    # carry only advances once a marker has been seen (mask row of the
    # carry itself encodes that)
    m_any = filled[-1:, -1:]
    carry[:, :] = jnp.where(m_any > 0.5, filled[:, -1:], carry[:, :])


def forward_fill(vals: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """vals: [n_slabs, D, S] with mask in row D-1 -> filled values."""
    n_slabs, d, s = vals.shape
    return pl.pallas_call(
        _fill_kernel,
        grid=(n_slabs,),
        in_specs=[pl.BlockSpec((1, d, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, d, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((d, 1), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(vals.shape, jnp.float32),
        interpret=interpret,
    )(vals)


def segmented_fill_rows(row_vals: jnp.ndarray, row_slots: jnp.ndarray,
                        length: int, interpret: bool = False) -> jnp.ndarray:
    """Scatter rows at slots, forward-fill -> [length, D] per-slot values.

    row_vals: [N, D]; row_slots: [N] int32 (>= length drops the row).
    Equivalent to value[searchsorted(...)-style src] without any gather.
    """
    n, d = row_vals.shape
    d_pad = d + 1  # + mask row
    length_pad = ((length + SLAB - 1) // SLAB) * SLAB
    flat = jnp.zeros((length_pad, d_pad), jnp.float32)
    rows = jnp.concatenate(
        [row_vals, jnp.ones((n, 1), jnp.float32)], axis=1)
    flat = flat.at[row_slots].set(rows, mode="drop")
    # [length_pad, D+1] -> [n_slabs, D+1, SLAB]
    slabs = flat.reshape(length_pad // SLAB, SLAB, d_pad).transpose(0, 2, 1)
    filled = forward_fill(slabs, interpret=interpret)
    out = filled.transpose(0, 2, 1).reshape(length_pad, d_pad)[:length, :d]
    return out

"""Sorted-interval row fold (segment-sum) as an MXU matmul (Pallas).

The raster backward produces per-pair gradient rows; folding them into
the per-particle table is the transpose of the binning expansion
(ops/pallas/expand.py): depth-rank particle r owns the contiguous
pair-slot interval [slot_r, next_r) of the PRE-tile-sort pair axis, so

    d_rank[r, f] = sum_l pre[l, f] * (rank_of_pair[l] == r)

is an equality-mask matmul that rides the MXU instead of XLA's
scatter-add lowering (~18.5 ms for 1M x 16 -> 100k on v5e; NOTES.md).
Each grid step owns BLKR=128 consecutive rank rows and streams only the
lane slabs covering its contiguous slot span (interval bounds arrive as
prefetch scalars); the per-pair rank labels stream alongside the data as
a lane-major sideband row, so the mask needs no per-rank scalar lifting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLKR = 128    # output rank rows per grid step
FSLAB = 2048  # pair lanes per streamed matmul block


def _fold_kernel(slot_ref, nxt_ref, pre_hbm, rank_hbm, out_ref, buf, rbuf,
                 sem, rsem, *, fdim):
    rb = pl.program_id(0)
    # contiguous span of pair slots covered by this rank block
    s0 = slot_ref[rb * BLKR]
    se = nxt_ref[rb * BLKR + BLKR - 1]
    first = s0 // FSLAB
    nblk = jnp.maximum(
        jax.lax.div(se - first * FSLAB + FSLAB - 1, FSLAB), 0)
    r_iota = (jax.lax.broadcasted_iota(jnp.int32, (BLKR, 1), 0)
              .astype(jnp.float32) + jnp.float32(rb * BLKR))

    def body(b, acc):
        dma = pltpu.make_async_copy(pre_hbm.at[first + b], buf, sem)
        rdma = pltpu.make_async_copy(rank_hbm.at[first + b], rbuf, rsem)
        dma.start()
        rdma.start()
        dma.wait()
        rdma.wait()
        mask = (rbuf[0:1, :] == r_iota).astype(jnp.float32)
        # [BLKR, FSLAB] @ [FSLAB, fdim] -> [BLKR, fdim]
        return acc + jax.lax.dot_general(
            mask, buf[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out_ref[0] = jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((BLKR, fdim), jnp.float32))


def fold_sorted_intervals(pre: jnp.ndarray, pair_rank: jnp.ndarray,
                          slot: jnp.ndarray, nxt: jnp.ndarray,
                          interpret: bool = False):
    """sum_{l: rank[l]==r} pre[l] -> [R, F] over sorted disjoint intervals.

    pre: [P, F] pair rows (P a multiple of FSLAB); pair_rank: [P] f32 rank
    labels (consistent with the intervals); slot/nxt: [R] int32 interval
    bounds clamped to [0, P], R a multiple of BLKR. Rows whose rank label
    lies outside the owning block contribute nothing (labels and
    intervals must agree).
    """
    p, fdim = pre.shape
    r = slot.shape[0]
    if p % FSLAB:
        padp = FSLAB - p % FSLAB
        pre = jnp.pad(pre, ((0, padp), (0, 0)))
        pair_rank = jnp.pad(pair_rank, (0, padp), constant_values=-1.0)
        p += padp
    if r % BLKR:
        padr = BLKR - r % BLKR
        out = fold_sorted_intervals(
            jnp.asarray(pre), pair_rank,
            jnp.pad(slot, (0, padr), constant_values=p),
            jnp.pad(nxt, (0, padr), constant_values=p),
            interpret=interpret)
        return out[:r]
    rank_rows = jnp.broadcast_to(
        pair_rank.reshape(p // FSLAB, 1, FSLAB), (p // FSLAB, 8, FSLAB))
    # chunked [n, FSLAB, F] blocks: whole-block DMAs (HBM slices along a
    # non-leading dim must be 128-lane aligned, which F=16 is not)
    pre_blocks = pre.reshape(p // FSLAB, FSLAB, fdim)
    return pl.pallas_call(
        functools.partial(_fold_kernel, fdim=fdim),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(r // BLKR,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, BLKR, fdim), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((FSLAB, fdim), jnp.float32),
                pltpu.VMEM((8, FSLAB), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r // BLKR, BLKR, fdim),
                                       jnp.float32),
        interpret=interpret,
    )(slot, nxt, pre_blocks, rank_rows).reshape(r, fdim)

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
prefetch scalars).

Layout: Mosaic requires HBM DMA lane dims to be 128-aligned, so PACK =
128/fdim consecutive pairs ride one 128-lane row (a pure reshape of the
row-major [P, fdim] gradient array); the per-pair rank labels stream as
a [PACK, FSLAB/PACK] sideband block and the fold runs PACK equality-mask
matmuls per slab, one per lane phase.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot_f32

BLKR = 128    # output rank rows per grid step
FSLAB = 2048  # pair lanes per streamed slab


def _fold_kernel(slot_ref, nxt_ref, pre_hbm, rank_hbm, out_ref, buf, rbuf,
                 sem, rsem, *, fd_pad, pack):
    rb = pl.program_id(0)
    # contiguous span of pair slots covered by this rank block. The
    # prefetch scalars are PER-BLOCK bounds ([R/BLKR], not [R]): scalar
    # prefetch lives in the 1 MB SMEM, and a capacity-sized i32 pair
    # (2 x cap x 4 B) blows it at cap >= ~128k (observed as a remote
    # 'prefetched SMEM operand' OOM on the 400k-capacity train run).
    s0 = slot_ref[rb]
    se = nxt_ref[rb]
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
        for k in range(pack):
            mask = (rbuf[k:k + 1, :] == r_iota).astype(jnp.float32)
            # [BLKR, FSLAB/pack] @ [FSLAB/pack, fd_pad]
            # dot_f32: an unannotated f32 dot runs ONE bf16 pass and
            # rounds the gradient VALUES to 2^-9 relative; the mask side
            # is exact 0/1 in bf16, so two split passes recover ~f32
            acc = acc + dot_f32(
                mask, buf[:, k * fd_pad:(k + 1) * fd_pad],
                (((1,), (0,)), ((), ())), exact_lhs=True)
        return acc

    out_ref[0] = jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((BLKR, fd_pad), jnp.float32))


def _fold_wide_kernel(slot_ref, nxt_ref, pre_hbm, rank_hbm, out_ref, buf,
                      rbuf, sem, rsem, *, fd_pad, hblk, upcast):
    """Superblock fold: ONE [128, S] x [S, 128] lane-contraction per slab.

    The narrow-fd kernel wastes 1 - fd_pad/128 of the MXU's output
    columns (fd_pad=16 -> 12.5% utilization). This variant covers
    ``hblk`` = 128/fd_pad rank blocks (a 128*hblk-rank SUPERBLOCK) per
    grid step by packing (rank-block, field) into the output lane dim:

        out[r_lo, h*fd_pad + f] = sum_p pre[p, f]
                                  * (rank_p == base + h*128 + r_lo)

    The equality factorizes: an r_lo mask as the LHS and the pre rows
    placed into sublane block h(rank) as the RHS - both cheap VPU
    selects - and the contraction runs over the full 2048-pair slab at
    100% MXU column utilization.
    """
    rb = pl.program_id(0)
    s0 = slot_ref[rb]
    se = nxt_ref[rb]
    first = s0 // FSLAB
    nblk = jnp.maximum(
        jax.lax.div(se - first * FSLAB + FSLAB - 1, FSLAB), 0)
    base = (rb * (128 * hblk)).astype(jnp.float32)
    lo_iota = (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
               .astype(jnp.float32))
    # sublane r of the packed RHS holds (h = r // fd_pad, f = r % fd_pad)
    hrow = (jax.lax.broadcasted_iota(jnp.int32, (128, FSLAB), 0)
            // fd_pad).astype(jnp.float32)

    def body(b, acc):
        dma = pltpu.make_async_copy(pre_hbm.at[first + b], buf, sem)
        rdma = pltpu.make_async_copy(rank_hbm.at[first + b], rbuf, rsem)
        dma.start()
        rdma.start()
        dma.wait()
        rdma.wait()
        rel = rbuf[0:1, :] - base                    # [1, S]
        h = jnp.floor(rel * (1.0 / 128.0))
        r_lo = rel - h * 128.0
        mask_lo = (r_lo == lo_iota).astype(jnp.float32)      # [128, S]
        rows = buf[...]
        if upcast:
            rows = rows.astype(jnp.float32)
        tile_h = jnp.concatenate([rows] * hblk, axis=0)      # [128, S]
        preh = jnp.where(hrow == h, tile_h, 0.0)
        return acc + dot_f32(mask_lo, preh, (((1,), (1,)), ((), ())),
                             exact_lhs=True)
    out_ref[0] = jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((128, 128), jnp.float32))


def fold_sorted_intervals_wide(pre: jnp.ndarray, pair_rank: jnp.ndarray,
                               slot: jnp.ndarray, nxt: jnp.ndarray,
                               interpret: bool = False):
    """:func:`fold_sorted_intervals` via the superblock MXU kernel.

    Same contract; additionally accepts bfloat16 ``pre`` (upcast after
    the chunk DMA, f32 accumulation - halves the dominant HBM read).
    """
    p, fdim = pre.shape
    r = slot.shape[0]
    fd_pad = next(d for d in (8, 16, 32, 64, 128) if d >= fdim)
    if pre.dtype == jnp.bfloat16:
        fd_pad = max(fd_pad, 16)   # bf16 sublane tiling floor
    if fdim < fd_pad:
        pre = jnp.pad(pre, ((0, 0), (0, fd_pad - fdim)))
    if p % FSLAB:
        padp = FSLAB - p % FSLAB
        pre = jnp.pad(pre, ((0, padp), (0, 0)))
        pair_rank = jnp.pad(pair_rank, (0, padp), constant_values=-1.0)
        p += padp
    hblk = 128 // fd_pad
    sb = 128 * hblk                       # ranks per superblock
    if r % sb:
        padr = sb - r % sb
        slot = jnp.pad(slot, (0, padr), constant_values=p)
        nxt = jnp.pad(nxt, (0, padr), constant_values=p)
    rp = slot.shape[0]
    blk_s0 = slot[::sb]
    blk_se = nxt[sb - 1::sb]
    n = p // FSLAB
    # transposed slabs: [n, fd_pad, FSLAB] (pairs on lanes)
    pre_t = pre.T.reshape(fd_pad, n, FSLAB).transpose(1, 0, 2)
    rank_rows = jnp.pad(pair_rank.reshape(n, 1, FSLAB),
                        ((0, 0), (0, 7), (0, 0)), constant_values=-1.0)
    out = pl.pallas_call(
        functools.partial(_fold_wide_kernel, fd_pad=fd_pad, hblk=hblk,
                          upcast=pre.dtype != jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rp // sb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 128, 128), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((fd_pad, FSLAB), pre.dtype),
                pltpu.VMEM((8, FSLAB), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rp // sb, 128, 128), jnp.float32),
        interpret=interpret,
    )(blk_s0, blk_se, pre_t, rank_rows)
    # out[rb][r_lo, h*fd_pad+f] -> rank rb*sb + h*128 + r_lo, field f
    out = out.reshape(rp // sb, 128, hblk, fd_pad).transpose(0, 2, 1, 3)
    return out.reshape(rp, fd_pad)[:r, :fdim]


def fold_sorted_intervals(pre: jnp.ndarray, pair_rank: jnp.ndarray,
                          slot: jnp.ndarray, nxt: jnp.ndarray,
                          interpret: bool = False):
    """sum_{l: rank[l]==r} pre[l] -> [R, F] over sorted disjoint intervals.

    pre: [P, F] pair rows (P a multiple of FSLAB); pair_rank: [P] f32 rank
    labels (consistent with the intervals); slot/nxt: [R] int32 interval
    bounds clamped to [0, P]. Labels outside [0, R) never match.
    """
    p, fdim = pre.shape
    r = slot.shape[0]
    fd_pad = next(d for d in (8, 16, 32, 64, 128) if d >= fdim)
    if fdim < fd_pad:
        pre = jnp.pad(pre, ((0, 0), (0, fd_pad - fdim)))
    if p % FSLAB:
        padp = FSLAB - p % FSLAB
        pre = jnp.pad(pre, ((0, padp), (0, 0)))
        pair_rank = jnp.pad(pair_rank, (0, padp), constant_values=-1.0)
        p += padp
    if r % BLKR:
        padr = BLKR - r % BLKR
        slot = jnp.pad(slot, (0, padr), constant_values=p)
        nxt = jnp.pad(nxt, (0, padr), constant_values=p)
    rp = slot.shape[0]
    # per-block span bounds (SMEM prefetch scalars; see _fold_kernel)
    blk_s0 = slot[::BLKR]
    blk_se = nxt[BLKR - 1::BLKR]
    pack = 128 // fd_pad
    n = p // FSLAB
    sp = FSLAB // pack
    # PACK consecutive pairs per 128-lane row (pure reshape, row-major)
    pre_blocks = pre.reshape(n, sp, pack * fd_pad)
    # rank sideband: [slab, k, row] = rank of pair slab*FSLAB + row*pack + k
    # (k dim padded to >= 8 sublanes for DMA tiling)
    rank_rows = pair_rank.reshape(n, sp, pack).transpose(0, 2, 1)
    rk = max(pack, 8)
    if pack < rk:
        rank_rows = jnp.pad(rank_rows, ((0, 0), (0, rk - pack), (0, 0)),
                            constant_values=-1.0)
    out = pl.pallas_call(
        functools.partial(_fold_kernel, fd_pad=fd_pad, pack=pack),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rp // BLKR,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, BLKR, fd_pad), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((sp, pack * fd_pad), jnp.float32),
                pltpu.VMEM((rk, sp), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rp // BLKR, BLKR, fd_pad),
                                       jnp.float32),
        interpret=interpret,
    )(blk_s0, blk_se, pre_blocks, rank_rows)
    return out.reshape(rp, fd_pad)[:r, :fdim]

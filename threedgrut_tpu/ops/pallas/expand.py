"""Sorted-interval row expansion as an MXU matmul (Pallas).

The binning pair expansion needs ``out[l] = rows[k(l)]`` where source k
owns the contiguous pair-slot interval [slot_k, next_k) (slots are the
exclusive cumsum of per-particle tile counts, so intervals are sorted and
disjoint). The previous implementation scattered rows at segment starts
and forward-filled (ops/pallas/fill.py); the XLA scatter-set alone costs
~14 ms for 100k rows into 1M x 12 on v5e (tests/tpu_profile7.py).

This kernel reformulates the expansion as a masked matmul: for an output
slab of S lanes and a block of B candidate sources,

    out[f, l] = sum_b rows[b, f] * ((slot_b <= l) & (l < next_b))

Intervals are disjoint, so each lane column of the mask selects exactly
one source row - the matmul IS the gather, and it rides the MXU instead
of XLA's scalar scatter loop. Per-slab candidate source ranges come from
two tiny vectorized binary searches host-side and arrive as prefetch
scalars.

Layout: table [R, 128] f32 - lanes 0..12 = payload (matches
ops/binning.py vals columns), lane 11 = slot, lane 12 = next_slot (both
exact f32: clamped to max_pairs <= 2^24). Output [n_slabs, 16, SLAB]
with values in sublanes 0..10 (column k of the old layout is
out[:, k, :].reshape(-1) - no transpose needed downstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 1024   # output lanes per grid step (measured: 1024 beats 8192 by ~2 ms
              # at the bench workload - tighter per-slab candidate ranges
              # mean ~3x less interval-mask work)
BLK = 128     # candidate source rows per matmul block
SLOT_LANE = 11
NEXT_LANE = 12


def _expand_kernel(src_start_ref, src_end_ref, table_hbm, out_ref,
                   buf, sem, *, slab):
    i = pl.program_id(0)
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)
            .astype(jnp.float32) + (i * slab).astype(jnp.float32))
    acc = _expand_acc(src_start_ref, src_end_ref, table_hbm, buf, sem,
                      lane, i, jnp.zeros_like(out_ref[0]))
    out_ref[0] = acc


def _expand_acc(src_start_ref, src_end_ref, table_hbm, buf, sem, lane, i,
                init):
    """Shared interval-matmul accumulation: [16, slab] selected values."""
    s0 = src_start_ref[i]
    se = src_end_ref[i]
    s0a = (s0 // BLK) * BLK
    nblk = jnp.maximum(jax.lax.div(se - s0a + BLK - 1, BLK), 0)

    def body(b, acc):
        dma = pltpu.make_async_copy(
            table_hbm.at[pl.ds(s0a + b * BLK, BLK)], buf, sem)
        dma.start()
        dma.wait()
        rows = buf[:, :]                       # [BLK, 128]
        slot = rows[:, SLOT_LANE:SLOT_LANE + 1]
        nxt = rows[:, NEXT_LANE:NEXT_LANE + 1]
        mask = ((slot <= lane) & (lane < nxt)).astype(jnp.float32)
        # [BLK,16]^T-contract [BLK,slab] -> [16, slab]; disjoint intervals
        # mean exactly one 1 per lane column, so this is an exact select
        # HIGHEST, not dot_f32: the selected values include particle
        # IDS as floats (up to capacity ~1M) and slot indices that the
        # decode must recover BIT-EXACTLY; a 2-pass split select leaves
        # a 2^-17 relative tail (test_values_exact_passthrough)
        return acc + jax.lax.dot_general(
            rows[:, :16], mask, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    return jax.lax.fori_loop(0, nblk, body, init)


def _bin_decode_kernel(src_start_ref, src_end_ref, total_ref, table_hbm,
                       out_ref, buf, sem, *, slab, grid_x,
                       num_tiles, tile_culling, tile_x, tile_y):
    """Expansion + pair decode + tile culling fused: emits per-pair
    (tile id, particle id) directly (the vals never round-trip HBM).

    Mirrors the XLA decode in ops/binning.py and the per-pair culling of
    tile_min_power_response (gutProjector.cuh:49-78), computed on [1,
    slab] lane rows.
    """
    i = pl.program_id(0)
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)
            .astype(jnp.float32) + (i * slab).astype(jnp.float32))
    acc = _expand_acc(src_start_ref, src_end_ref, table_hbm, buf, sem,
                      lane, i, jnp.zeros((16, slab), jnp.float32))

    lo_x, lo_y = acc[0:1, :], acc[1:2, :]
    w_src = jnp.maximum(acc[2:3, :], 1.0)
    rank = lane - acc[3:4, :]
    ry = jnp.floor(rank / w_src)
    rx = rank - ry * w_src
    tx = lo_x + rx
    ty = lo_y + ry
    particle = acc[4:5, :]

    in_range = lane < total_ref[0].astype(jnp.float32)
    keep = in_range
    if tile_culling:
        a, b, c = acc[5:6, :], acc[6:7, :], acc[7:8, :]
        cx, cy = acc[8:9, :], acc[9:10, :]
        max_power = acc[10:11, :]
        tmin_x = tile_x * tx
        tmin_y = tile_y * ty
        tmax_x = tmin_x + tile_x
        tmax_y = tmin_y + tile_y
        moff_x = tmin_x - cx
        moff_y = tmin_y - cy
        la_x = (moff_x > 0.0).astype(jnp.float32)
        la_y = (moff_y > 0.0).astype(jnp.float32)
        beyond_x = la_x + (cx > tmax_x).astype(jnp.float32)
        beyond_y = la_y + (cy > tmax_y).astype(jnp.float32)
        outside = (beyond_x + beyond_y) > 0.0
        px = tmax_x * (1.0 - la_x) + tmin_x * la_x
        py = tmax_y * (1.0 - la_y) + tmin_y * la_y
        dx = jnp.where(moff_x == 0.0, tile_x, jnp.sign(moff_x) * tile_x)
        dy = jnp.where(moff_y == 0.0, tile_y, jnp.sign(moff_y) * tile_y)
        diff_x = cx - px
        diff_y = cy - py
        rcp_x = 1.0 / (tile_x * tile_x * a)
        rcp_y = 1.0 / (tile_y * tile_y * c)
        ox = beyond_y * jnp.clip(
            (dx * a * diff_x + dx * b * diff_y) * rcp_x, 0.0, 1.0)
        oy = beyond_x * jnp.clip(
            (dy * b * diff_x + dy * c * diff_y) * rcp_y, 0.0, 1.0)
        mx = px + ox * dx
        my = py + oy * dy
        ddx = cx - mx
        ddy = cy - my
        power = (0.5 * (a * ddx * ddx + c * ddy * ddy) + b * ddx * ddy)
        power = jnp.where(outside, power, 0.0)
        keep = keep & (power < max_power)

    sentinel = jnp.float32(num_tiles)
    pair_tile = jnp.where(keep, ty * grid_x + tx, sentinel)
    rank = acc[13:14, :]   # depth-sorted source row (lane 13 of the table)
    # row-select instead of concatenating single-sublane pieces (Mosaic
    # rejects (1, S) concats)
    s = pair_tile.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, s), 0)
    out_ref[0] = jnp.where(
        row == 0, jnp.broadcast_to(pair_tile, (8, s)),
        jnp.where(row == 1, jnp.broadcast_to(particle, (8, s)),
                  jnp.where(row == 2, jnp.broadcast_to(rank, (8, s)),
                            0.0)))


def expand_sorted_rows(table: jnp.ndarray, src_start: jnp.ndarray,
                       src_end: jnp.ndarray, n_slabs: int,
                       slab: int = SLAB,
                       interpret: bool = False) -> jnp.ndarray:
    """table: [R, 128] (R a multiple of BLK, slot/next in lanes 11/12,
    intervals sorted & disjoint); src_start/src_end: [n_slabs] int32
    candidate row ranges per slab. Returns [n_slabs, 16, slab]."""
    r = table.shape[0]
    if r % BLK:
        raise ValueError(f"table rows {r} must be a multiple of {BLK}")
    return pl.pallas_call(
        functools.partial(_expand_kernel, slab=slab),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_slabs,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 16, slab), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BLK, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_slabs, 16, slab), jnp.float32),
        interpret=interpret,
    )(src_start, src_end, table)


def expand_decode_pairs(table: jnp.ndarray, src_start: jnp.ndarray,
                        src_end: jnp.ndarray, total: jnp.ndarray,
                        n_slabs: int, slab: int, grid: tuple,
                        tile_culling: bool, tile_x: int, tile_y: int,
                        interpret: bool = False):
    """Fused expansion + pair decode + tile culling.

    Returns (pair_tile, pair_particle, pair_rank) [n_slabs*slab] f32;
    culled / out-of-range pairs carry the num_tiles tile sentinel (their
    rank label stays the owning depth row, table lane 13).
    """
    r = table.shape[0]
    if r % BLK:
        raise ValueError(f"table rows {r} must be a multiple of {BLK}")
    gx, gy = grid
    out = pl.pallas_call(
        functools.partial(_bin_decode_kernel, slab=slab, grid_x=gx,
                          num_tiles=gx * gy, tile_culling=tile_culling,
                          tile_x=float(tile_x), tile_y=float(tile_y)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_slabs,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, slab), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BLK, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_slabs, 8, slab), jnp.float32),
        interpret=interpret,
    )(src_start, src_end, total.reshape(1).astype(jnp.int32), table)
    return (out[:, 0, :].reshape(-1), out[:, 1, :].reshape(-1),
            out[:, 2, :].reshape(-1))

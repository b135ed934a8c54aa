"""Sort-based tile binning with static shapes (TPU-native).

Replaces the reference's count -> cub::InclusiveSum -> D2H readback ->
expand -> cub radix sort pipeline (threedgut_tracer/src/gutRenderer.cu:241-421)
with a fixed-capacity, sync-free XLA program:

1. particles are depth-sorted once ([N] sort, so within-tile order after a
   *stable* tile sort equals the reference's global-Z order),
2. (particle, tile) pairs are materialized into a fixed ``max_pairs``
   buffer; overflow drops the *farthest* particles and is reported,
3. per-pair tile culling (gutProjector.cuh:49-78) marks pairs invalid
   instead of compacting them - invalid pairs sort to the end,
4. a stable sort by tile id + chunk-aligned per-tile segments.

TPU-specific design: XLA lowers random gathers/scatters to scalar loops
(~10 ms per 2M-row gather, ~14 ms per 100k-row scatter-set on v5e), so
the expansion avoids per-pair gathers AND scatters: depth-sorted
particles own contiguous pair-slot intervals, and an interval-mask
matmul kernel (ops/pallas/expand.py) materializes per-pair values on the
MXU directly from the per-particle table.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pallas.expand import BLK, SLAB, expand_sorted_rows, expand_decode_pairs
from .ut import TILE_X, TILE_Y, Projection, tile_min_power_response


class Binning(NamedTuple):
    pair_particle: jnp.ndarray  # [P] int32 particle idx, tile-sorted
    tile_start: jnp.ndarray     # [T+1] int32 raw segment boundaries
    num_pairs: jnp.ndarray      # [] int32 valid pairs after culling
    overflow: jnp.ndarray       # [] int32 pairs dropped due to capacity
    # gradient-fold metadata (None unless carry_perm; see
    # ops/pallas/fold.py and render/gut.py _gather_records_fold):
    perm: jnp.ndarray = None        # [P] i32 tile-sorted pos -> pre slot
    pair_rank: jnp.ndarray = None   # [P] f32 PRE-order depth-rank label
    rank_slot: jnp.ndarray = None   # [cap] i32 pre-slot interval start
    rank_next: jnp.ndarray = None   # [cap] i32 pre-slot interval end
    rank_particle: jnp.ndarray = None  # [cap] i32 depth rank -> particle
    # aligned-layout extras (None unless aligned=True):
    tile_count: jnp.ndarray = None  # [T] i32 visible (real) pairs per tile
    fwd_map: jnp.ndarray = None     # [P] i32 raw slot -> aligned slot (-1
    #                                 for slots outside every visible tile)


def bin_particles(proj: Projection, tile_grid, max_pairs: int,
                  chunk: int = 128, tile_culling: bool = True,
                  alpha_threshold: float = 1.0 / 255.0,
                  carry_perm: bool = False,
                  aligned: bool = False,
                  interpret: bool = False) -> Binning:
    """Bin projected particles into per-tile depth-ordered pair lists.

    Tile segments are raw [start, end) ranges into the tile-sorted pair
    list; the compositing kernel streams floor/ceil-aligned chunks around
    each range and masks boundary lanes (the backward accumulates shared
    boundary chunks sequentially).

    With ``aligned=True`` each tile's segment is re-based to a ``chunk``
    boundary inside the same ``max_pairs`` buffer (padding consumes
    budget headroom and is accounted in ``overflow`` so the trainer's
    auto-calibration grows the budget): no chunk is shared between
    tiles, so the raster kernels never re-visit boundary chunks and the
    backward's cross-tile pending accumulation never fires. Returns
    ``tile_start`` as the aligned boundaries, ``tile_count`` as the
    real (visible) per-tile counts and ``fwd_map`` (raw slot ->
    aligned slot) for the gradient fold.
    """
    gx, gy = tile_grid
    num_tiles = gx * gy
    n = proj.center.shape[0]

    # tile bbox + counts (invalid particles project to empty boxes)
    inv_tx = 1.0 / TILE_X
    inv_ty = 1.0 / TILE_Y
    lo_x = jnp.clip(jnp.floor((proj.center[:, 0] - 0.5 - proj.extent[:, 0]) * inv_tx), 0, gx)
    lo_y = jnp.clip(jnp.floor((proj.center[:, 1] - 0.5 - proj.extent[:, 1]) * inv_ty), 0, gy)
    hi_x = jnp.clip(jnp.ceil((proj.center[:, 0] - 0.5 + proj.extent[:, 0]) * inv_tx), 0, gx)
    hi_y = jnp.clip(jnp.ceil((proj.center[:, 1] - 0.5 + proj.extent[:, 1]) * inv_ty), 0, gy)
    width = jnp.maximum(hi_x - lo_x, 0.0)
    counts = jnp.where(proj.valid, (width * jnp.maximum(hi_y - lo_y, 0.0)),
                       0.0).astype(jnp.int32)

    # depth-sort particles so pair emission order == global Z order
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)              # [N] stable ascending
    counts_sorted = counts[order]
    offsets = jnp.cumsum(counts_sorted)          # inclusive
    total = offsets[-1]
    excl = (offsets - counts_sorted).astype(jnp.int32)

    # --- gather-free expansion ------------------------------------------
    # Each depth-sorted particle owns the contiguous pair-slot interval
    # [excl, offsets); the expansion kernel turns per-particle rows into
    # per-pair values with an interval-mask matmul (ops/pallas/expand.py).
    # One wide row gather beats per-column gathers ~3x on v5e.
    max_power = jnp.log(jnp.maximum(proj.opacity, 1e-30) / alpha_threshold)
    mat = jnp.stack([
        lo_x, lo_y, width,
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        proj.center[:, 0], proj.center[:, 1], max_power,
    ], axis=1)[order]                            # [N, 9] depth-sorted

    mp_f = jnp.float32(max_pairs)
    slot = jnp.minimum(excl.astype(jnp.float32), mp_f)
    nxt = jnp.minimum(offsets.astype(jnp.float32), mp_f)
    n_rows = ((n + BLK - 1) // BLK) * BLK + BLK
    table = jnp.concatenate([
        mat[:, 0:3],                              # lanes 0..2
        excl.astype(jnp.float32)[:, None],        # lane 3
        order.astype(jnp.float32)[:, None],       # lane 4
        mat[:, 3:9],                              # lanes 5..10
        slot[:, None], nxt[:, None],              # lanes 11, 12
        jnp.arange(n, dtype=jnp.float32)[:, None],  # lane 13: depth rank
        jnp.zeros((n, 128 - 14), jnp.float32),
    ], axis=1)
    table = jnp.pad(table, ((0, n_rows - n), (0, 0)))
    table = jax.lax.stop_gradient(table)          # binning is structural

    slab = min(SLAB, max_pairs)
    if max_pairs % slab:
        raise ValueError(f"max_pairs {max_pairs} must be a multiple of "
                         f"{slab}")
    n_slabs = max_pairs // slab
    bounds = jnp.arange(n_slabs, dtype=jnp.int32)
    offs_c = jnp.minimum(offsets, max_pairs).astype(jnp.int32)
    excl_c = jnp.minimum(excl, max_pairs)
    src_start = jnp.searchsorted(offs_c, bounds * slab, side="right",
                                 method="scan_unrolled").astype(jnp.int32)
    src_end = jnp.searchsorted(excl_c, (bounds + 1) * slab, side="left",
                               method="scan_unrolled").astype(jnp.int32)
    # fused expand + decode + cull: per-pair (tile, particle) come out of
    # one kernel pass; the vals table never round-trips HBM
    pt_f, pp_f, pr_f = expand_decode_pairs(
        table, src_start, src_end, jnp.minimum(total, max_pairs),
        n_slabs, slab, tile_grid, tile_culling, TILE_X, TILE_Y,
        interpret=interpret)
    # stable multi-operand sort by tile id; depth order within tile is
    # preserved. (A packed single-u32-key sort + particle re-gather was
    # measured SLOWER on v5e: binning 9.2 -> 14.8 ms; XLA's multi-operand
    # sort moves payloads cheaply.)
    pair_tile = pt_f.astype(jnp.int32)
    pair_particle = pp_f.astype(jnp.int32)
    # multi-operand sort moves the payloads through the sort network;
    # MEASURED best: argsort + row gathers = 23 ms binning vs 8.4 here
    # (gathers at 700k rows are expensive in-program even though tunnel
    # -latency-polluted micro-probes say otherwise), packed-u32 single
    # -key sort was 9.2 -> 14.8 ms (earlier note).
    perm = None
    if carry_perm:
        iota = jnp.arange(pair_tile.shape[0], dtype=jnp.int32)
        pair_tile, pair_particle, perm = jax.lax.sort(
            (pair_tile, pair_particle, iota), num_keys=1, is_stable=True)
    else:
        pair_tile, pair_particle = jax.lax.sort(
            (pair_tile, pair_particle), num_keys=1, is_stable=True)

    # vectorized binary search (the default "scan" method lowers to a
    # sequential loop on TPU: 3.9 ms -> ~0.1 ms for 2.5k queries into 1M)
    raw_start = jnp.searchsorted(
        pair_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left",
        method="scan_unrolled").astype(jnp.int32)
    num_pairs = jnp.sum((pair_tile < num_tiles).astype(jnp.int32))
    overflow = jnp.maximum(total - max_pairs, 0)
    extra = {}
    if carry_perm:
        extra = dict(perm=perm, pair_rank=pr_f,
                     rank_slot=excl_c.astype(jnp.int32),
                     rank_next=offs_c,
                     rank_particle=order.astype(jnp.int32))
    if aligned:
        return _align_segments(pair_particle.astype(jnp.int32), raw_start,
                               num_pairs, overflow, extra, num_tiles,
                               max_pairs, chunk, interpret)
    return Binning(pair_particle=pair_particle.astype(jnp.int32),
                   tile_start=raw_start,
                   num_pairs=num_pairs,
                   overflow=overflow.astype(jnp.int32), **extra)


def _tile_interval_expand(payload, starts, ends, max_pairs, slab,
                          interpret):
    """Broadcast per-tile payload rows onto their slot intervals.

    payload: list of [T] f32 columns; starts/ends: [T] i32 sorted
    disjoint intervals within [0, max_pairs). Returns one [max_pairs]
    f32 array per payload column (zeros on uncovered slots) via the
    interval-mask MXU kernel (ops/pallas/expand.py).
    """
    t = starts.shape[0]
    n_rows = ((t + BLK - 1) // BLK) * BLK + BLK
    cols = [jnp.zeros((t, 1), jnp.float32) for _ in range(11)]
    for i, c in enumerate(payload):
        cols[i] = c.astype(jnp.float32)[:, None]
    rows = jnp.concatenate(
        cols + [starts.astype(jnp.float32)[:, None],
                ends.astype(jnp.float32)[:, None],
                jnp.zeros((t, 128 - 13), jnp.float32)], axis=1)
    rows = jnp.pad(rows, ((0, n_rows - t), (0, 0)))
    n_slabs = max_pairs // slab
    bounds = jnp.arange(n_slabs, dtype=jnp.int32)
    src_start = jnp.searchsorted(ends, bounds * slab, side="right",
                                 method="scan_unrolled").astype(jnp.int32)
    src_end = jnp.searchsorted(starts, (bounds + 1) * slab, side="left",
                               method="scan_unrolled").astype(jnp.int32)
    out = expand_sorted_rows(rows, src_start, src_end, n_slabs, slab=slab,
                             interpret=interpret)
    return [out[:, i, :].reshape(-1) for i in range(len(payload))]


def _align_segments(pair_particle, raw_start, num_pairs, overflow, extra,
                    num_tiles, max_pairs, chunk, interpret):
    """Re-base tile segments to chunk boundaries within the same buffer.

    Each tile's pairs move to [astart_t, astart_t + count_t) with
    astart_t a multiple of ``chunk``; the inter-tile gaps are padding
    lanes the kernels mask. Alignment padding that pushes the layout
    past ``max_pairs`` truncates trailing tiles and is reported through
    ``overflow`` (the trainer's pair-budget auto-calibration then grows
    the budget exactly like a raw-pair overflow).
    """
    counts = raw_start[1:] - raw_start[:-1]                       # [T]
    aligned_len = ((counts + chunk - 1) // chunk) * chunk
    astart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(aligned_len)]).astype(jnp.int32)
    aligned_total = astart[-1]
    astart_c = jnp.minimum(astart, max_pairs)                     # [T+1]
    count_vis = jnp.clip(counts, 0, max_pairs - astart_c[:-1])    # [T]

    # wide slabs: these passes have ~2-20 source tiles per slab (vs the
    # pair expansion's hundreds of particles), so per-slab fixed costs
    # dominate at SLAB=1024
    slab = 8192 if max_pairs % 8192 == 0 else min(SLAB, max_pairs)
    # aligned slot j -> raw source slot (one pass over aligned space)
    delta, src_end_f, covered = _tile_interval_expand(
        [(raw_start[:-1] - astart_c[:-1]),
         (raw_start[:-1] + count_vis),
         jnp.ones_like(count_vis)],
        astart_c[:-1], astart_c[1:], max_pairs, slab, interpret)
    j_f = jnp.arange(max_pairs, dtype=jnp.float32)
    src_f = j_f + delta
    valid = (covered > 0.0) & (src_f < src_end_f)
    src = jnp.clip(src_f, 0, max_pairs - 1).astype(jnp.int32)
    aligned_particle = jnp.where(valid, pair_particle[src], 0)

    if extra:
        # raw slot i -> aligned slot (one pass over raw space) for the
        # gradient fold's un-permute; -1 marks raw slots outside every
        # visible tile (culled / truncated pairs -> zero gradient)
        delta2, covered2 = _tile_interval_expand(
            [(astart_c[:-1] - raw_start[:-1]), jnp.ones_like(count_vis)],
            raw_start[:-1], raw_start[:-1] + count_vis, max_pairs, slab,
            interpret)
        fmap_f = j_f + delta2
        ok = (covered2 > 0.0) & (fmap_f < max_pairs)
        fwd_map = jnp.where(ok, fmap_f, -1.0).astype(jnp.int32)
        extra = dict(extra, fwd_map=fwd_map)

    overflow = jnp.maximum(overflow, aligned_total - max_pairs)
    return Binning(pair_particle=aligned_particle,
                   tile_start=astart_c,
                   num_pairs=jnp.sum(count_vis),
                   overflow=overflow.astype(jnp.int32),
                   tile_count=count_vis, **extra)

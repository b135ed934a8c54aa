"""Sort-based tile binning with static shapes (TPU-native).

Replaces the reference's count -> cub::InclusiveSum -> D2H readback ->
expand -> cub radix sort pipeline (threedgut_tracer/src/gutRenderer.cu:241-421)
with a fixed-capacity, sync-free XLA program:

1. particles are depth-sorted once ([N] sort, so within-tile order after a
   *stable* tile sort equals the reference's global-Z order),
2. (particle, tile) pairs are materialized into a fixed ``max_pairs``
   buffer via a searchsorted expansion (no scatter, no dynamic shapes);
   overflow drops the *farthest* particles and is reported as a counter,
3. per-pair tile culling (gutProjector.cuh:49-78) marks pairs invalid
   instead of compacting them - invalid pairs sort to the end,
4. a stable sort by tile id + per-tile ranges via searchsorted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ut import TILE_X, TILE_Y, Projection, tile_min_power_response


class Binning(NamedTuple):
    pair_particle: jnp.ndarray  # [P_total] int32 particle idx per slot, -1 pad
    tile_start: jnp.ndarray     # [T+1] int32 chunk-aligned segment starts
    num_pairs: jnp.ndarray      # [] int32 valid pairs after culling
    overflow: jnp.ndarray       # [] int32 pairs dropped due to capacity


def total_pair_slots(max_pairs: int, tile_grid, chunk: int) -> int:
    """Static capacity of the aligned pair list (worst-case padding)."""
    return max_pairs + tile_grid[0] * tile_grid[1] * chunk


def bin_particles(proj: Projection, tile_grid, max_pairs: int,
                  chunk: int = 32, tile_culling: bool = True,
                  alpha_threshold: float = 1.0 / 255.0) -> Binning:
    """Bin projected particles into per-tile depth-ordered pair lists.

    Each tile's segment starts at a ``chunk``-aligned offset; padding slots
    hold particle id -1 so the compositing kernel can stream whole chunks
    without tile-boundary masking (and the backward can write whole chunk
    rows of gradients race-free).
    """
    gx, gy = tile_grid
    num_tiles = gx * gy
    n = proj.center.shape[0]

    # tile bbox + counts (invalid particles project to empty boxes)
    inv_tx = 1.0 / TILE_X
    inv_ty = 1.0 / TILE_Y
    lo_x = jnp.clip(jnp.floor((proj.center[:, 0] - 0.5 - proj.extent[:, 0]) * inv_tx), 0, gx).astype(jnp.int32)
    lo_y = jnp.clip(jnp.floor((proj.center[:, 1] - 0.5 - proj.extent[:, 1]) * inv_ty), 0, gy).astype(jnp.int32)
    hi_x = jnp.clip(jnp.ceil((proj.center[:, 0] - 0.5 + proj.extent[:, 0]) * inv_tx), 0, gx).astype(jnp.int32)
    hi_y = jnp.clip(jnp.ceil((proj.center[:, 1] - 0.5 + proj.extent[:, 1]) * inv_ty), 0, gy).astype(jnp.int32)
    width = jnp.maximum(hi_x - lo_x, 0)
    height = jnp.maximum(hi_y - lo_y, 0)
    counts = jnp.where(proj.valid, width * height, 0)

    # depth-sort particles so pair emission order == global Z order
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)              # [N] stable ascending
    counts_sorted = counts[order]
    offsets = jnp.cumsum(counts_sorted)          # inclusive
    total = offsets[-1]
    excl = offsets - counts_sorted               # exclusive

    # expansion: pair j belongs to the sorted particle whose range
    # [excl_i, excl_i + count_i) contains j. Equivalent to
    # searchsorted(offsets, j, 'right') but computed with one scatter +
    # cummax instead of a binary-search gather loop (which is ~10x slower
    # on TPU): mark each nonempty particle's range start with its index,
    # then forward-fill.
    pair_j = jnp.arange(max_pairs, dtype=jnp.int32)
    nonempty = counts_sorted > 0
    markers = jnp.zeros(max_pairs, jnp.int32).at[
        jnp.where(nonempty, excl, max_pairs)].max(
        jnp.arange(n, dtype=jnp.int32) + 1, mode="drop")
    src = jax.lax.cummax(markers) - 1
    src = jnp.clip(src, 0, n - 1)
    in_range = pair_j < jnp.minimum(total, max_pairs)
    rank = pair_j - excl[src]
    w_src = jnp.maximum(width[order][src], 1)
    tx = lo_x[order][src] + rank % w_src
    ty = lo_y[order][src] + rank // w_src
    pair_particle = order[src]
    pair_tile = jnp.where(in_range, ty * gx + tx, num_tiles)

    if tile_culling:
        tile_xy = jnp.stack([tx, ty], axis=-1).astype(jnp.float32)
        power = tile_min_power_response(
            tile_xy, proj.conic[pair_particle], proj.opacity[pair_particle],
            proj.center[pair_particle])
        max_power = jnp.log(
            jnp.maximum(proj.opacity[pair_particle], 1e-30) / alpha_threshold)
        keep = power < max_power
        pair_tile = jnp.where(in_range & keep, pair_tile, num_tiles)

    # stable sort by tile id; depth order within tile is preserved
    pair_tile, pair_particle = jax.lax.sort(
        (pair_tile, pair_particle), num_keys=1, is_stable=True)

    raw_start = jnp.searchsorted(
        pair_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # chunk-aligned re-layout: tile t occupies
    # [aligned_start[t], aligned_start[t] + ceil(count_t / chunk) * chunk)
    counts = raw_start[1:] - raw_start[:-1]                       # [T]
    padded = ((counts + chunk - 1) // chunk) * chunk
    aligned_start = jnp.concatenate([
        jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)])

    p_total = total_pair_slots(max_pairs, tile_grid, chunk)
    pair_j2 = jnp.arange(pair_tile.shape[0], dtype=jnp.int32)
    tile_clip = jnp.minimum(pair_tile, num_tiles - 1)
    rank_in_tile = pair_j2 - raw_start[tile_clip]
    dest = jnp.where(pair_tile < num_tiles,
                     aligned_start[tile_clip] + rank_in_tile, p_total)
    aligned_particle = jnp.full(p_total, -1, jnp.int32).at[dest].set(
        pair_particle.astype(jnp.int32), mode="drop")

    num_pairs = jnp.sum((pair_tile < num_tiles).astype(jnp.int32))
    overflow = jnp.maximum(total - max_pairs, 0)
    return Binning(pair_particle=aligned_particle,
                   tile_start=aligned_start,
                   num_pairs=num_pairs,
                   overflow=overflow.astype(jnp.int32))

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
(~10 ms per 2M-row gather on v5e), so the expansion avoids per-pair
gathers entirely. All per-particle values a pair needs are scattered once
(N rows) to each particle's segment-start slot and then propagated with a
single segmented forward-fill (a sequential-carry Pallas kernel,
ops/pallas/fill.py) - one streaming pass instead of ~10 scalar gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pallas.fill import segmented_fill_rows
from .ut import TILE_X, TILE_Y, Projection, tile_min_power_response


class Binning(NamedTuple):
    pair_particle: jnp.ndarray  # [P] int32 particle idx, tile-sorted
    tile_start: jnp.ndarray     # [T+1] int32 raw segment boundaries
    num_pairs: jnp.ndarray      # [] int32 valid pairs after culling
    overflow: jnp.ndarray       # [] int32 pairs dropped due to capacity


def bin_particles(proj: Projection, tile_grid, max_pairs: int,
                  chunk: int = 128, tile_culling: bool = True,
                  alpha_threshold: float = 1.0 / 255.0,
                  interpret: bool = False) -> Binning:
    """Bin projected particles into per-tile depth-ordered pair lists.

    Tile segments are raw [start, end) ranges into the tile-sorted pair
    list; the compositing kernel streams floor/ceil-aligned chunks around
    each range and masks boundary lanes (the backward accumulates shared
    boundary chunks sequentially).
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
    # every per-particle value a pair needs rides one [N, D] row scattered
    # to the particle's first pair slot, then forward-filled
    max_power = jnp.log(jnp.maximum(proj.opacity, 1e-30) / alpha_threshold)
    per_particle = jnp.stack([
        lo_x[order], lo_y[order], width[order],
        excl.astype(jnp.float32),
        order.astype(jnp.float32),
        proj.conic[order, 0], proj.conic[order, 1], proj.conic[order, 2],
        proj.center[order, 0], proj.center[order, 1],
        max_power[order],
    ], axis=1)                                   # [N, 11]

    nonempty = counts_sorted > 0
    start_slot = jnp.where(nonempty, excl, max_pairs)
    # binning is structural (non-differentiable) - stop gradients before
    # the fill kernel (pallas_call has no autodiff rule)
    vals = segmented_fill_rows(jax.lax.stop_gradient(per_particle),
                               start_slot, max_pairs, interpret=interpret)

    pair_j = jnp.arange(max_pairs, dtype=jnp.int32)
    in_range = pair_j < jnp.minimum(total, max_pairs)
    rank = pair_j.astype(jnp.float32) - vals[:, 3]
    w_src = jnp.maximum(vals[:, 2], 1.0)
    # decode bbox-local tile coordinates (float math is exact: all values
    # are small integers < 2^24)
    ry = jnp.floor(rank / w_src)
    rx = rank - ry * w_src
    tx = vals[:, 0] + rx
    ty = vals[:, 1] + ry
    pair_particle = vals[:, 4].astype(jnp.int32)
    pair_tile = jnp.where(in_range,
                          (ty * gx + tx).astype(jnp.int32), num_tiles)

    if tile_culling:
        tile_xy = jnp.stack([tx, ty], axis=-1)
        power = tile_min_power_response(
            tile_xy, vals[:, 5:8], None, vals[:, 8:10])
        keep = power < vals[:, 10]
        pair_tile = jnp.where(in_range & keep, pair_tile, num_tiles)

    # stable sort by tile id; depth order within tile is preserved
    pair_tile, pair_particle = jax.lax.sort(
        (pair_tile, pair_particle), num_keys=1, is_stable=True)

    # vectorized binary search (the default "scan" method lowers to a
    # sequential loop on TPU: 3.9 ms -> ~0.1 ms for 2.5k queries into 1M)
    raw_start = jnp.searchsorted(
        pair_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left",
        method="scan_unrolled").astype(jnp.int32)

    num_pairs = jnp.sum((pair_tile < num_tiles).astype(jnp.int32))
    overflow = jnp.maximum(total - max_pairs, 0)
    return Binning(pair_particle=pair_particle.astype(jnp.int32),
                   tile_start=raw_start,
                   num_pairs=num_pairs,
                   overflow=overflow.astype(jnp.int32))

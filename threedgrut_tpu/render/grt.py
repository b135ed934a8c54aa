"""3DGRT: per-ray volumetric Gaussian ray tracing (TPU redesign).

The reference 3DGRT (threedgrt_tracer/) marches OptiX rays against a BVH
of particle proxies, gathering k=16 nearest hits per trace segment and
compositing them in per-ray depth order (referenceOptix.cu:103-186,
pipelineParameters.h:83 MaxNumHitPerTrace). There are no RT cores on TPU;
this module preserves the *semantics* with TPU-native machinery:

- primary (camera) rays: the standard tile-binning pipeline generates the
  depth-ordered candidate list (binning = the BVH-equivalent culling) and
  the Pallas kernel composites with per-ray chunk re-sorting
  (sorted_compositing - a 128-deep ordering window, strictly wider than
  the reference's 16-deep hit buffer),
- arbitrary rays (``trace``, playground secondary rays): a world-space
  uniform-grid acceleration structure (build_grid, SURVEY.md section 7.9)
  selects per-256-ray-block candidate cells front-to-back; a brute-force
  full-list march remains as the exact fallback/oracle. Differentiable
  either way.

Config deltas vs 3DGUT (configs/render/3dgrt.yaml): kernel degree 4,
min_transmittance 1e-3.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState
from ..ops.cameras import CameraModel
from ..ops.pallas.raster import (CHUNK, TILE_PIX, RasterKernelConfig,
                                 rasterize_tiles)
from ..ops.quaternion import quat_normalize
from ..ops.sh import eval_sh_radiance
from ..ops.ut import UTConfig
from .common import RasterConfig
from .gut import render_gut


def grt_raster_config(base: Optional[RasterConfig] = None) -> RasterConfig:
    """3DGRT rendering defaults (configs/render/3dgrt.yaml)."""
    base = base or RasterConfig()
    return base.replace(kernel_degree=4, min_transmittance=1e-3,
                        sorted_compositing=True)


def render_grt(cam: CameraModel, ut_cfg: UTConfig, raster_cfg: RasterConfig,
               model: GaussianState, sh_degree: int,
               rays: Optional[tuple] = None,
               interpret: Optional[bool] = None):
    """Primary-ray 3DGRT render (camera view)."""
    return render_gut(cam, ut_cfg, grt_raster_config(raster_cfg), model,
                      sh_degree, rays=rays, interpret=interpret)


class GridAccel:
    """World-space uniform-grid acceleration structure for trace().

    The TPU-native replacement of the reference's OptiX BVH
    (threedgrt_tracer/src/optixTracer.cpp:616 buildBVH): per-cell
    particle lists built fully on device with sort/searchsorted (no
    scatter), plus a "global" list for particles larger than a cell
    (which a 2x2x2 corner-lattice assignment could miss). Build once
    per frame and reuse across bounces (playground) via the ``accel=``
    argument of :func:`trace`.
    """

    def __init__(self, lo, cs, dims, pair_particle, pair_rank, seg_start,
                 global_particle, global_rank, rank_origin, overflow):
        self.lo = lo                        # [3] grid origin
        self.cs = cs                        # [3] cell size
        self.dims = dims                    # static G (G^3 cells)
        self.pair_particle = pair_particle  # [8*cap] i32 (cell,rank)-sorted
        self.pair_rank = pair_rank          # [8*cap] f32
        self.seg_start = seg_start          # [G^3+2] i32 cell segments
        self.global_particle = global_particle  # [global_cap] i32
        self.global_rank = global_rank          # [global_cap] f32
        self.rank_origin = rank_origin      # [3] ordering reference point
        self.overflow = overflow            # [] i32 dropped oversized


def build_grid(model: GaussianState, rank_origin, grid_dims: int = 8,
               global_cap: int = 1024) -> GridAccel:
    """Build the uniform grid over active particles (device-side).

    Small particles (diameter <= cell size) are emitted to their <= 8
    overlapped cells via the 2x2x2 corner lattice; larger ones go to the
    global list (every block composites them), overflowing ones beyond
    ``global_cap`` are dropped and counted in ``overflow``.
    """
    g = grid_dims
    cap = model.capacity
    active = model.active_mask()
    pos = model.params.positions
    r3 = 3.0 * jnp.max(model.get_scale(), axis=-1)          # [C]
    big = jnp.float32(3e37)
    lo = jnp.min(jnp.where(active[:, None], pos - r3[:, None], big), axis=0)
    hi = jnp.max(jnp.where(active[:, None], pos + r3[:, None], -big),
                 axis=0)
    cs = jnp.maximum((hi - lo) / g, 1e-6)

    small = active & (2.0 * r3 <= jnp.min(cs))
    base = jnp.clip(jnp.floor((pos - r3[:, None] - lo) / cs), 0,
                    g - 1).astype(jnp.int32)                # [C,3]
    top = jnp.clip(jnp.floor((pos + r3[:, None] - lo) / cs), 0,
                   g - 1).astype(jnp.int32)

    n_cells = g * g * g
    cells = []
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                cx = jnp.minimum(base[:, 0] + ox, top[:, 0])
                cy = jnp.minimum(base[:, 1] + oy, top[:, 1])
                cz = jnp.minimum(base[:, 2] + oz, top[:, 2])
                cells.append((cx * g + cy) * g + cz)        # [C]
    cells = jnp.stack(cells, axis=1)                        # [C,8]
    # dedupe repeated cells (span-1 axes repeat ids) -> sentinel
    dup = jnp.zeros_like(cells, dtype=bool)
    for i in range(1, 8):
        same = jnp.zeros((cap,), bool)
        for j in range(i):
            same = same | (cells[:, i] == cells[:, j])
        dup = dup.at[:, i].set(same)
    cells = jnp.where(small[:, None] & ~dup, cells, n_cells)

    rank = jnp.where(active, jnp.linalg.norm(pos - rank_origin, axis=1),
                     jnp.inf)
    pid = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32)[:, None],
                           (cap, 8))
    cell_s, rank_s, pid_s = jax.lax.sort(
        (cells.reshape(-1), jnp.broadcast_to(rank[:, None],
                                             (cap, 8)).reshape(-1),
         pid.reshape(-1)), num_keys=2)
    seg_start = jnp.searchsorted(
        cell_s, jnp.arange(n_cells + 2, dtype=jnp.int32), side="left",
        method="scan_unrolled").astype(jnp.int32)

    # oversized particles: rank-sorted global list with a static cap
    over_key = jnp.where(active & ~small, 0, 1).astype(jnp.int32)
    _, g_rank, g_pid = jax.lax.sort(
        (over_key, rank, jnp.arange(cap, dtype=jnp.int32)), num_keys=2)
    n_over = jnp.sum((active & ~small).astype(jnp.int32))
    take = min(global_cap, cap)
    g_particle = jnp.where(jnp.arange(take) < n_over, g_pid[:take], -1)
    g_rank = jnp.where(jnp.arange(take) < n_over, g_rank[:take], jnp.inf)
    if take < global_cap:
        g_particle = jnp.pad(g_particle, (0, global_cap - take),
                             constant_values=-1)
        g_rank = jnp.pad(g_rank, (0, global_cap - take),
                         constant_values=jnp.inf)
    # the grid is structural: no gradients flow through build outputs
    sg = jax.lax.stop_gradient
    return GridAccel(sg(lo), sg(cs), grid_dims, pid_s, sg(rank_s),
                     seg_start, g_particle, sg(g_rank),
                     sg(jnp.asarray(rank_origin)),
                     jnp.maximum(n_over - global_cap, 0))


def trace(model: GaussianState, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
          sh_degree: int = 3, raster_cfg: Optional[RasterConfig] = None,
          t_min=1e-4, t_max=1e7,
          accelerate: Optional[bool] = None,
          accel: Optional[GridAccel] = None,
          grid_dims: int = 8, max_cells: int = 24, cell_cap: int = 256,
          global_cap: int = 1024,
          interpret: Optional[bool] = None, _sorted: bool = True):
    """Trace arbitrary world-space rays against the mixture.

    The TPU equivalent of model.trace() / threedgrt_tracer raw-ray
    inference (threedgrut/model/model.py:918-930): rays in any layout
    [..., 3]; returns a dict of the same leading shape.

    Two regimes (the BVH-equivalent spatial structure, SURVEY.md hard
    part #4 / section 7.9 uniform grid):
    - brute force (``accelerate=False``): every 256-ray block marches
      ALL active particles in global depth order (sorted per chunk for
      correct per-ray ordering). Exact; O(blocks x capacity).
    - uniform grid (default for capacity > 8192): a world-space
      ``grid_dims``^3 cell grid over the active particles (build_grid;
      pass a prebuilt one via ``accel`` to amortize over bounces). Each
      256-ray block slab-tests all cells, keeps the ``max_cells``
      nearest hit cells (by block-min entry distance, front-to-back),
      gathers up to ``cell_cap`` particles per cell plus the global
      oversized list, de-duplicates particles straddling several
      selected cells, and re-sorts the block's candidates into global
      depth-rank order - so coverage losses aside, the composited
      sequence is identical to brute force. Spatially local in all three
      axes: rays perpendicular to the camera depth axis no longer
      degrade to a full scan (the failure mode of round 1's
      depth-slab clusters).

    Differentiable w.r.t. model parameters either way (per-block
    disjoint candidate segments -> classic kernel backward).

    ``_sorted`` is test plumbing only: False drops the per-chunk bitonic
    re-sort (whose interpret-mode vjp compile is minutes-slow) so tests
    can exercise the accelerated gradient path cheaply. Production
    callers keep the default (3DGRT k-buffer ordering semantics).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    raster_cfg = grt_raster_config(raster_cfg)

    lead_shape = rays_o.shape[:-1]
    n_rays = 1
    for s in lead_shape:
        n_rays *= s
    n_blocks = max((n_rays + TILE_PIX - 1) // TILE_PIX, 1)
    pad = n_blocks * TILE_PIX - n_rays

    ro = jnp.pad(rays_o.reshape(-1, 3), ((0, pad), (0, 0)))
    rd = jnp.pad(rays_d.reshape(-1, 3), ((0, pad), (0, 0)),
                 constant_values=1.0)
    rd = rd / jnp.maximum(jnp.linalg.norm(rd, axis=-1, keepdims=True), 1e-12)
    # t_min / t_max: scalars or per-ray arrays of the leading shape
    tmin_b = jnp.broadcast_to(
        jnp.asarray(t_min, jnp.float32).reshape(-1)[..., None]
        if jnp.ndim(jnp.asarray(t_min)) > 0 else jnp.asarray(t_min),
        (n_rays,)) if jnp.ndim(jnp.asarray(t_min)) == 0 else \
        jnp.asarray(t_min, jnp.float32).reshape(-1)
    tmax_b = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), (n_rays,)) \
        if jnp.ndim(jnp.asarray(t_max)) == 0 else \
        jnp.asarray(t_max, jnp.float32).reshape(-1)
    tmin = jnp.pad(tmin_b, (0, pad))[:, None]
    tmax_arr = jnp.pad(tmax_b, (0, pad), constant_values=-1.0)[:, None]
    rays_packed = jnp.concatenate(
        [ro, rd, tmin, tmax_arr], axis=1).reshape(n_blocks, TILE_PIX, 8)

    # depth order by distance to the mean ray origin (chunk re-sorting
    # fixes residual per-ray inversions within each 128 window)
    center = jnp.mean(ro[:max(n_rays, 1)], axis=0)
    dist = jnp.linalg.norm(model.params.positions - center, axis=1)
    active = model.active_mask()
    order = jnp.argsort(jnp.where(active, dist, jnp.inf))

    cap = model.capacity
    n_chunk_rows = ((cap + CHUNK - 1) // CHUNK) * CHUNK
    idx = jnp.pad(order, (0, n_chunk_rows - cap), constant_values=0)
    slot_valid = (jnp.arange(n_chunk_rows) < jnp.sum(
        active.astype(jnp.int32))).astype(jnp.float32)[:, None]

    if accelerate is None:
        accelerate = accel is not None or cap > 8192

    kcfg = RasterKernelConfig(
        kernel_degree=raster_cfg.kernel_degree,
        min_response=raster_cfg.min_response,
        min_alpha=raster_cfg.min_alpha,
        max_alpha=raster_cfg.max_alpha,
        min_transmittance=raster_cfg.min_transmittance,
        shared_origin=False, feature_mode="constant", feat_dim=3,
        # full-chunk ordering for the arbitrary-ray march: the accel
        # path re-packs clusters, so windows must span the whole chunk
        # for brute/accel lane-partition agreement
        sorted_compositing=_sorted, sort_window=CHUNK,
        compute_normals=raster_cfg.enable_normals,
        # brute force: every ray block scans the same full particle
        # segment -> backward accumulates across programs. accelerated:
        # per-block disjoint candidate segments -> classic backward.
        shared_segments=not accelerate,
        exact_kill=raster_cfg.exact_kill,
        records_bf16=raster_cfg.records_bf16,
        scan_mxu=raster_cfg.scan_mxu,
        sort_skip_dead=raster_cfg.sort_skip_dead,
        skip_dead_bwd=raster_cfg.skip_dead_bwd)

    quats = quat_normalize(model.params.rotation)
    # per-particle SH radiance from the mean-origin direction (matching
    # the rasterizer's precomputed-features convention)
    view_dir = (model.params.positions - center)
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=1, keepdims=True), 1e-12)
    feats = jnp.maximum(
        eval_sh_radiance(model.sh_coeffs(), view_dir, sh_degree), 0.0)

    rdim = kcfg.record_dim
    pad_cols = rdim - kcfg.feat_offset - kcfg.particle_feat_dim
    scale_s = model.get_scale()[idx]
    pos_s = model.params.positions[idx]
    table_rows = jnp.concatenate([
        pos_s,
        quats[idx],
        scale_s,
        model.get_density()[idx] * slot_valid,
        feats[idx],
        jnp.zeros((n_chunk_rows, pad_cols), jnp.float32),
    ], axis=1)

    if accelerate:
        # uniform-grid traversal (build_grid): per-block front-to-back
        # cell selection + global depth-rank candidate ordering
        if accel is None:
            accel = build_grid(model, center, grid_dims=grid_dims,
                               global_cap=global_cap)
        g = accel.dims
        n_cells = g * g * g
        k_sel = min(max_cells, n_cells)
        # cell AABBs from indices
        ci = jnp.arange(n_cells, dtype=jnp.int32)
        ijk = jnp.stack([ci // (g * g), (ci // g) % g, ci % g],
                        axis=1).astype(jnp.float32)        # [M,3]
        cell_lo = accel.lo + ijk * accel.cs
        cell_hi = cell_lo + accel.cs

        def select(block):                        # [256, 8] -> [K], [K]
            o, d = block[:, 0:3], block[:, 3:6]
            bt0, bt1 = block[:, 6:7], block[:, 7:8]
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            t0 = (cell_lo[None] - o[:, None]) * inv[:, None]
            t1 = (cell_hi[None] - o[:, None]) * inv[:, None]
            tn = jnp.max(jnp.minimum(t0, t1), axis=-1)     # [256, M]
            tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hit = (tf >= jnp.maximum(tn, bt0)) & (tn <= bt1)
            # nearest entry distance over the block's rays, hit cells only
            tkey = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf),
                           axis=0)                         # [M]
            neg_top, sel_idx = jax.lax.top_k(-tkey, k_sel)
            return sel_idx, -neg_top

        sel, sel_t = jax.vmap(select)(rays_packed)         # [B, K]
        sel_hit = jnp.isfinite(sel_t)

        # gather each selected cell's particle list (cap cell_cap)
        seg_s = accel.seg_start[sel]                       # [B, K]
        seg_n = accel.seg_start[sel + 1] - seg_s
        within = jnp.arange(cell_cap, dtype=jnp.int32)
        rows = seg_s[:, :, None] + within[None, None, :]   # [B, K, Cc]
        valid = (within[None, None, :] < jnp.minimum(seg_n, cell_cap)
                 [:, :, None]) & sel_hit[:, :, None]
        total_pairs = accel.pair_particle.shape[0]
        rows_c = jnp.clip(rows, 0, total_pairs - 1).reshape(n_blocks, -1)
        pid = jnp.where(valid.reshape(n_blocks, -1),
                        accel.pair_particle[rows_c], cap)  # cap = dead row
        rnk = jnp.where(valid.reshape(n_blocks, -1),
                        accel.pair_rank[rows_c], jnp.inf)
        # cell-list overflow telemetry (no silent caps)
        cell_overflow = jnp.sum(
            jnp.where(sel_hit, jnp.maximum(seg_n - cell_cap, 0), 0))

        # append the global (oversized-particle) list to every block
        g_pid = jnp.where(accel.global_particle >= 0, accel.global_particle,
                          cap)
        pid = jnp.concatenate(
            [pid, jnp.broadcast_to(g_pid[None], (n_blocks,) + g_pid.shape)],
            axis=1)
        rnk = jnp.concatenate(
            [rnk, jnp.broadcast_to(accel.global_rank[None],
                                   (n_blocks,) + accel.global_rank.shape)],
            axis=1)
        seg_len = ((pid.shape[1] + CHUNK - 1) // CHUNK) * CHUNK
        pad_l = seg_len - pid.shape[1]
        if pad_l:
            pid = jnp.pad(pid, ((0, 0), (0, pad_l)), constant_values=cap)
            rnk = jnp.pad(rnk, ((0, 0), (0, pad_l)),
                          constant_values=jnp.inf)
        # global depth-rank order per block (the brute-force sequence,
        # minus unselected cells), then de-duplicate particles that were
        # emitted to several selected cells (adjacent after the sort)
        rnk, pid = jax.lax.sort(
            (jax.lax.stop_gradient(rnk), pid), num_keys=1, is_stable=True)
        dup = jnp.concatenate(
            [jnp.zeros((n_blocks, 1), bool), pid[:, 1:] == pid[:, :-1]],
            axis=1)
        pid = jnp.where(dup, cap, pid)

        # dead row keeps every chunk written in the backward; geometry is
        # NaN-safe (identity quat, unit scale, zero density)
        dead = jnp.zeros((1, rdim), jnp.float32)
        dead = dead.at[:, 3].set(1.0)        # quat w
        dead = dead.at[:, 7:10].set(1.0)     # scale
        # grid path uses raw particle ids -> un-sorted table
        table_raw = jnp.concatenate([
            model.params.positions, quats, model.get_scale(),
            model.get_density() * model.active_mask()[:, None], feats,
            jnp.zeros((cap, pad_cols), jnp.float32)], axis=1)
        table_ext = jnp.concatenate([table_raw, dead], axis=0)
        flat = pid.reshape(-1)
        records = table_ext[flat]
        records = records.reshape(flat.shape[0] // CHUNK, CHUNK,
                                  rdim).transpose(0, 2, 1)
        tile_start = jnp.arange(n_blocks, dtype=jnp.int32) * seg_len
        tile_count = jnp.full(n_blocks, seg_len, jnp.int32)
    else:
        records = table_rows.reshape(n_chunk_rows // CHUNK, CHUNK,
                                     rdim).transpose(0, 2, 1)
        # every block scans the full list (shared segment; the kernel's
        # shared_segments backward accumulates across blocks)
        tile_start = jnp.zeros(n_blocks, jnp.int32)
        tile_count = jnp.full(n_blocks, n_chunk_rows, jnp.int32)
    out = rasterize_tiles(records, tile_start, tile_count, rays_packed,
                          kcfg, interpret)
    out = out.reshape(n_blocks * TILE_PIX, -1)[:n_rays]
    result = {
        "pred_features": out[:, 0:3].reshape(*lead_shape, 3),
        "pred_opacity": out[:, 3:4].reshape(*lead_shape, 1),
        "pred_dist": out[:, 4:5].reshape(*lead_shape, 1),
        "hits_count": out[:, 5:6].reshape(*lead_shape, 1),
    }
    if accelerate:
        # capacity telemetry (no silent caps): cell lists truncated at
        # cell_cap + oversized particles dropped past global_cap
        result["accel_overflow"] = cell_overflow + accel.overflow
    if kcfg.compute_normals:
        result["pred_normals"] = out[:, 7:10].reshape(*lead_shape, 3)
    return result

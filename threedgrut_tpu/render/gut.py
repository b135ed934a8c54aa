"""3DGUT production renderer: UT projection -> binning -> Pallas raster.

End-to-end differentiable, single jitted XLA program per (camera model,
resolution, capacity) - the TPU equivalent of the reference render stack
threedgut_tracer/src/gutRenderer.cu:241-421 without its device->host
readback/sync (gutRenderer.cu:314-323).

Returned dict mirrors threedgut_tracer/tracer.py:342-350:
``pred_features`` [H,W,3], ``pred_opacity`` [H,W,1], ``pred_dist`` [H,W,1],
``hits_count`` [H,W,1], ``mog_visibility`` [C].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState
from ..ops import binning as binning_ops
from ..ops import ut as ut_ops
from ..ops.cameras import CameraModel
from ..ops.pallas.raster import (CHUNK, RasterKernelConfig,
                                 rasterize_tiles, rasterize_tiles_table,
                                 rasterize_weight_telemetry)
from ..ops.quaternion import quat_normalize
from ..ops.sh import eval_sh_radiance
from ..ops.ut import TILE_X, TILE_Y, UTConfig
from .common import RasterConfig, camera_rays_world


def _scene_aabb(model: GaussianState):
    """Conservative scene AABB over active particles (+-3 sigma).

    Stands in for the reference's params.objectAABB used to clip ray
    t-ranges (rayPayload.cuh:96-99).
    """
    mask = model.active_mask()[:, None]
    pos = model.params.positions
    rad = 3.0 * jnp.max(model.get_scale(), axis=-1, keepdims=True)
    big = jnp.float32(3e37)
    lo = jnp.min(jnp.where(mask, pos - rad, big), axis=0)
    hi = jnp.max(jnp.where(mask, pos + rad, -big), axis=0)
    return lo, hi


def _ray_aabb(ray_o, ray_d, lo, hi):
    """Slab test -> (tmin, tmax) per ray; tmin clamped at 0."""
    inv = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-12,
                          jnp.where(ray_d >= 0, 1e-12, -1e-12), ray_d)
    t0 = (lo - ray_o) * inv
    t1 = (hi - ray_o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.maximum(tmin, 0.0), tmax


def pack_rays(ray_o, ray_d, tmin, tmax, grid):
    """[Hp,Wp,...] pixel arrays -> [T, 256, 8] tile-major ray blocks."""
    gx, gy = grid

    def tilize(a):  # [Hp,Wp,c] -> [T, 256, c]
        c = a.shape[-1]
        a = a.reshape(gy, TILE_Y, gx, TILE_X, c)
        return a.transpose(0, 2, 1, 3, 4).reshape(gy * gx, TILE_Y * TILE_X, c)

    return jnp.concatenate([
        tilize(ray_o), tilize(ray_d),
        tilize(tmin[..., None]), tilize(tmax[..., None]),
    ], axis=2)


def unpack_tiles(out, grid, height, width, out_dim=8):
    """[T, 256, out_dim] -> [H, W, out_dim] (cropping padding)."""
    gx, gy = grid
    img = out.reshape(gy, gx, TILE_Y, TILE_X, out_dim)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * TILE_Y, gx * TILE_X,
                                               out_dim)
    return img[:height, :width]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _gather_records_fold(table, idx, perm, fwd_map, pair_rank, rank_slot,
                         rank_next, rank_particle, interpret, fold_mode):
    """``table[idx]`` whose backward folds pair gradients with the
    particle-order interval-matmul kernel (ops/pallas/fold.py) instead of
    XLA's scatter-add lowering: un-permute d_records to the pre-tile-sort
    pair order (where each depth rank owns a contiguous slot interval),
    MXU-fold per rank, then map depth ranks back to particle rows.

    ``fwd_map`` (aligned-segment layouts only) rebases the un-permute
    through the raw-slot -> aligned-slot map; -1 entries (culled /
    truncated pairs) read zero gradient.

    ``fold_mode`` is a static (wide, bf16) pair: ``wide`` picks the
    superblock full-MXU fold kernel; ``bf16`` rounds the per-pair
    gradient rows to bfloat16 before the un-permute gather (the fold
    still accumulates f32)."""
    return table[idx]


def _grf_fwd(table, idx, perm, fwd_map, pair_rank, rank_slot, rank_next,
             rank_particle, interpret, fold_mode):
    res = (perm, fwd_map, pair_rank, rank_slot, rank_next, rank_particle)
    return table[idx], res


def _grf_bwd(interpret, fold_mode, res, g):
    from ..ops.pallas.fold import (fold_sorted_intervals,
                                   fold_sorted_intervals_wide)

    wide, bf16 = fold_mode
    perm, fwd_map, pair_rank, rank_slot, rank_next, rank_particle = res
    if bf16:
        g = g.astype(jnp.bfloat16)
    inv_pm = jnp.argsort(perm)          # pre slot -> tile-sorted position
    if fwd_map is not None:
        fm = fwd_map[inv_pm]            # pre slot -> aligned position
        pre = jnp.where(fm[:, None] >= 0, g[jnp.maximum(fm, 0)],
                        jnp.zeros((), g.dtype))
    else:
        pre = g[inv_pm]
    fold = fold_sorted_intervals_wide if (wide or bf16) \
        else fold_sorted_intervals
    d_rank = fold(pre, pair_rank, rank_slot, rank_next,
                  interpret=interpret)
    inv_rank = jnp.argsort(rank_particle)   # particle -> depth rank
    d_table = d_rank[inv_rank]
    return d_table, None, None, None, None, None, None, None


_gather_records_fold.defvjp(_grf_fwd, _grf_bwd)


def render_gut(cam: CameraModel, ut_cfg: UTConfig, raster_cfg: RasterConfig,
               model: GaussianState, sh_degree: int,
               rays: Optional[tuple] = None,
               interpret: Optional[bool] = None,
               weight_telemetry: bool = False):
    """Render one view with the 3DGUT pipeline.

    Args:
        rays: optional (ray_o [H,W,3], ray_d [H,W,3]) world-space override
            (defaults to camera raygen through the start pose).
        sh_degree: active SH degree (static -> specializes the compile,
            mirroring the reference's compile-time defines).
        weight_telemetry: run the max-blend-weight kernel instead of the
            compositing kernel and return {"particle_wmax": [C]} - the
            per-particle max_pixel(alpha*T) the GS strategy's weight
            pruning consumes.
    """
    if interpret is None:
        # Pallas kernels only compile for TPU; CPU (tests, virtual meshes)
        # runs the interpreter.
        interpret = jax.default_backend() != "tpu"
    w, h = cam.resolution
    gx = (w + TILE_X - 1) // TILE_X
    gy = (h + TILE_Y - 1) // TILE_Y
    grid = (gx, gy)

    proj = ut_ops.unscented_projection(
        cam, ut_cfg, model.params.positions, model.params.rotation,
        model.get_scale(), model.get_density()[:, 0], model.active_mask())

    nht = model.config.feature_type == "nht"
    if nht:
        # NHT: per-(pair, pixel) features -> raw control features ride
        # in the records; evaluation happens in-kernel at the canonical
        # intersection (neuralHarmonicFeaturesParticle.slang).
        feats = model.params.features                  # [C, 4*interp_dim]
        interp_pt_dim = feats.shape[1] // 4
        feat_dim = interp_pt_dim * 2  # sincos, 1 frequency
    else:
        # per-particle radiance from the sensor->particle direction
        # (PerRayParticleFeatures=false; gutProjector.cuh:306-310), clamped
        # at 0 like the renderer's tcnn::max(features, 0) fetch.
        feats = eval_sh_radiance(model.sh_coeffs(), proj.view_dir, sh_degree)
        feats = jnp.maximum(feats, 0.0)
        interp_pt_dim = 0
        feat_dim = 3

    b = binning_ops.bin_particles(
        proj, grid, raster_cfg.max_pairs, chunk=CHUNK,
        tile_culling=raster_cfg.tile_culling,
        alpha_threshold=ut_cfg.alpha_threshold,
        carry_perm=raster_cfg.grad_fold,
        aligned=raster_cfg.aligned_segments, interpret=interpret)

    # the hot path (camera rays, global shutter) has one shared ray origin
    # -> the kernel can use the factorized MXU response (chunk_hits_fast).
    # NHT needs the canonical intersection point -> general geometry.
    from ..ops.cameras import ShutterType
    shared_origin = (rays is None
                     and cam.shutter_type == int(ShutterType.GLOBAL))

    kcfg = RasterKernelConfig(
        kernel_degree=raster_cfg.kernel_degree,
        min_response=raster_cfg.min_response,
        min_alpha=raster_cfg.min_alpha,
        max_alpha=raster_cfg.max_alpha,
        min_transmittance=raster_cfg.min_transmittance,
        shared_origin=shared_origin and not nht,
        feature_mode="nht" if nht else "constant",
        feat_dim=feat_dim,
        interp_pt_dim=interp_pt_dim if nht else 12,
        sorted_compositing=raster_cfg.sorted_compositing and not nht,
        sort_window=raster_cfg.sort_window,
        compute_normals=raster_cfg.enable_normals and not nht,
        exact_kill=raster_cfg.exact_kill,
        records_bf16=raster_cfg.records_bf16,
        early_exit=raster_cfg.early_exit,
        fused_mxu=raster_cfg.fused_mxu,
        fused_mxu_bwd=raster_cfg.fused_mxu_bwd,
        flat_grid=raster_cfg.flat_grid,
        scan_mxu=raster_cfg.scan_mxu,
        sort_skip_dead=raster_cfg.sort_skip_dead,
        skip_dead_bwd=raster_cfg.skip_dead_bwd)

    # pair records (differentiable gather from model params), laid out as
    # [C, record_dim, CHUNK] contiguous chunk blocks for single-DMA
    # streaming
    idx = b.pair_particle
    quats = quat_normalize(model.params.rotation)
    p_total = b.pair_particle.shape[0]
    rdim = kcfg.record_dim
    pad_cols = rdim - kcfg.feat_offset - kcfg.particle_feat_dim
    # per-particle record table first (N-sized concat), then ONE row
    # gather - a single wide gather is ~4x cheaper on TPU than per-field
    # gathers
    cap = model.capacity
    if kcfg.shared_origin:
        # per-particle canonical-map precompute (see chunk_hits_fast):
        # M = diag(1/s) R^T, a = M (o - p)
        from ..ops.quaternion import quat_to_rotmat
        from ..ops.ut import sensor_position
        origin = sensor_position(cam)
        rot = quat_to_rotmat(quats)                       # [C,3,3]
        inv_s = 1.0 / model.get_scale()                   # [C,3]
        m_mat = inv_s[:, :, None] * jnp.swapaxes(rot, 1, 2)  # [C,3,3]
        delta = origin - model.params.positions           # [C,3]
        gro = jnp.einsum("nij,nj->ni", m_mat, delta,
                         precision="highest")             # [C,3]
        table = jnp.concatenate([
            gro, m_mat.reshape(-1, 9), model.get_density(), feats,
            jnp.zeros((cap, pad_cols), jnp.float32)], axis=1)
    else:
        table = jnp.concatenate([
            model.params.positions, quats, model.get_scale(),
            model.get_density(), feats,
            jnp.zeros((cap, pad_cols), jnp.float32)], axis=1)
    # sentinel / out-of-range pairs lie outside every tile's [start, end)
    # range and are lane-masked in the kernel - no value masking needed
    if raster_cfg.grad_fold:
        records = _gather_records_fold(
            table, idx, b.perm, b.fwd_map, b.pair_rank, b.rank_slot,
            b.rank_next, b.rank_particle, interpret,
            (raster_cfg.fold_wide, raster_cfg.grad_bf16))
    else:
        records = table[idx]
    n_chunks = p_total // CHUNK
    records = records.reshape(n_chunks, CHUNK, rdim).transpose(0, 2, 1)
    # gradient route: the table path folds d_records on-chip via the
    # Pallas scatter kernel, but its sequential per-pair loop measured
    # SLOWER than XLA's scatter-add on v5e (5.6 vs 8.6 it/s end to end),
    # so the classic per-pair gather/scatter backward stays the default.
    table_grad = False

    # rays (padded to the tile grid; padding rays get empty t-ranges)
    if rays is None:
        ray_o, ray_d = camera_rays_world(cam)
    else:
        ray_o, ray_d = rays
    hp, wp = gy * TILE_Y, gx * TILE_X
    pad_h, pad_w = hp - h, wp - w
    ray_o = jnp.pad(ray_o, ((0, pad_h), (0, pad_w), (0, 0)))
    ray_d = jnp.pad(ray_d, ((0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=1.0)
    lo, hi = _scene_aabb(model)
    tmin, tmax = _ray_aabb(ray_o, ray_d, lo, hi)
    if pad_h or pad_w:
        ys = jnp.arange(hp)[:, None]
        xs = jnp.arange(wp)[None, :]
        is_pad = (ys >= h) | (xs >= w)
        tmax = jnp.where(is_pad, -1.0, tmax)
    rays_packed = pack_rays(ray_o, ray_d, tmin, tmax, grid)

    tile_count = (b.tile_count if b.tile_count is not None
                  else b.tile_start[1:] - b.tile_start[:-1])
    if weight_telemetry:
        wpair = rasterize_weight_telemetry(
            jax.lax.stop_gradient(records), b.tile_start[:-1], tile_count,
            rays_packed, kcfg, interpret)
        wmax = jax.ops.segment_max(wpair, b.pair_particle,
                                   num_segments=cap)
        return {"particle_wmax": jnp.maximum(wmax, 0.0)}
    if table_grad:
        ids = b.pair_particle.reshape(n_chunks, CHUNK)
        out = rasterize_tiles_table(
            table, jax.lax.stop_gradient(records), ids,
            b.tile_start[:-1], tile_count, rays_packed, kcfg, interpret)
    else:
        out = rasterize_tiles(records, b.tile_start[:-1], tile_count,
                              rays_packed, kcfg, interpret)

    img = unpack_tiles(out, grid, h, w, kcfg.out_dim)
    fd = kcfg.feat_dim
    result = {
        "pred_features": img[..., 0:fd],
        "pred_opacity": img[..., fd:fd + 1],
        "pred_dist": img[..., fd + 1:fd + 2],
        "hits_count": img[..., fd + 2:fd + 3],
        "mog_visibility": proj.valid,
        "num_pairs": b.num_pairs,
        "pairs_overflow": b.overflow,
    }
    if kcfg.compute_normals:
        result["pred_normals"] = img[..., fd + 4:fd + 7]
    return result

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
- arbitrary rays (``trace``, playground secondary rays): rays are packed
  into 256-ray blocks that brute-force march the full depth-sorted
  particle list in chunks (no spatial binning yet); differentiable via
  the kernel's shared-segment backward.

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


def trace(model: GaussianState, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
          sh_degree: int = 3, raster_cfg: Optional[RasterConfig] = None,
          t_min=1e-4, t_max=1e7,
          interpret: Optional[bool] = None):
    """Trace arbitrary world-space rays against the mixture.

    The TPU equivalent of model.trace() / threedgrt_tracer raw-ray
    inference (threedgrut/model/model.py:918-930): rays in any layout
    [..., 3]; returns a dict of the same leading shape.

    Brute force: every 256-ray block marches ALL active particles in
    global depth order (sorted per chunk for correct per-ray ordering).
    Differentiable w.r.t. model parameters (the kernel's shared_segments
    backward; reference parity: threedgrut/model/model.py trace autograd).
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

    kcfg = RasterKernelConfig(
        kernel_degree=raster_cfg.kernel_degree,
        min_response=raster_cfg.min_response,
        min_alpha=raster_cfg.min_alpha,
        max_alpha=raster_cfg.max_alpha,
        min_transmittance=raster_cfg.min_transmittance,
        shared_origin=False, feature_mode="constant", feat_dim=3,
        sorted_compositing=True,
        compute_normals=raster_cfg.enable_normals,
        # every ray block scans the same full particle segment, so the
        # backward accumulates gradients across programs
        shared_segments=True)

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
    records = jnp.concatenate([
        model.params.positions[idx],
        quats[idx],
        model.get_scale()[idx],
        model.get_density()[idx] * slot_valid,
        feats[idx],
        jnp.zeros((n_chunk_rows, pad_cols), jnp.float32),
    ], axis=1)
    records = records.reshape(n_chunk_rows // CHUNK, CHUNK,
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
    if kcfg.compute_normals:
        result["pred_normals"] = out[:, 7:10].reshape(*lead_shape, 3)
    return result

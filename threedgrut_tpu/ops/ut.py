"""Unscented-Transform particle projection for the 3DGUT rasterizer.

Projects each 3D Gaussian through an arbitrary (possibly distorted /
rolling-shutter) camera via 7 sigma points, producing a 2D mean + 2x2
covariance, conic/opacity, screen extent and tile bounding boxes.

Reference: threedgut_tracer .../renderers/gutProjector.cuh:32-322 and the
constants in threedgut_tracer/include/3dgut/threedgut.cuh:39-65.
This file is pure JAX (vmapped elementwise math over particles); XLA fuses
it into a handful of kernels - the MXU is not needed here.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from .cameras import CameraModel, project_point_with_shutter, quat_to_rotmat
from .quaternion import quat_normalize

TILE_X = 16
TILE_Y = 16
TILE_PIXELS = TILE_X * TILE_Y


@struct.dataclass
class UTConfig:
    """Static projector configuration (values of configs/render/3dgut.yaml)."""
    alpha: float = struct.field(pytree_node=False, default=1.0)
    beta: float = struct.field(pytree_node=False, default=2.0)
    kappa: float = struct.field(pytree_node=False, default=0.0)
    n_rolling_shutter_iterations: int = struct.field(pytree_node=False, default=5)
    image_margin_factor: float = struct.field(pytree_node=False, default=0.1)
    require_all_sigma_points: bool = struct.field(pytree_node=False, default=False)
    # culling
    rect_bounding: bool = struct.field(pytree_node=False, default=True)
    tight_opacity_bounding: bool = struct.field(pytree_node=False, default=True)
    tile_based_culling: bool = struct.field(pytree_node=False, default=True)
    # projector params (threedgut.cuh:55-65)
    min_sensor_z: float = struct.field(pytree_node=False, default=0.2)
    covariance_dilation: float = struct.field(pytree_node=False, default=0.3)
    alpha_threshold: float = struct.field(pytree_node=False, default=1.0 / 255.0)
    mip_splatting_scaling: bool = struct.field(pytree_node=False, default=True)
    global_z_order: bool = struct.field(pytree_node=False, default=True)

    @property
    def delta(self) -> float:
        # UT_DELTA = sqrt(alpha^2 * (D + kappa)), D = 3 (setup_3dgut.py:40-44)
        return math.sqrt(self.alpha * self.alpha * (3.0 + self.kappa))


class Projection(NamedTuple):
    """Per-particle projection outputs, all shape [N, ...]."""
    valid: jnp.ndarray          # [N] bool - passed projection + conic checks
    center: jnp.ndarray         # [N, 2] projected mean (pixels)
    conic: jnp.ndarray          # [N, 3] inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray        # [N] (possibly mip-scaled) opacity
    extent: jnp.ndarray         # [N, 2] screen-space half extent (pixels)
    depth: jnp.ndarray          # [N] sort depth (sensor z or distance)
    view_dir: jnp.ndarray       # [N, 3] unit direction sensor -> particle


def unscented_projection(cam: CameraModel, cfg: UTConfig,
                         positions: jnp.ndarray, quats: jnp.ndarray,
                         scales: jnp.ndarray, opacities: jnp.ndarray,
                         active: jnp.ndarray) -> Projection:
    """Project N particles; everything static-shaped, invalid -> masked.

    Args:
        positions: [N,3] world means.
        quats: [N,4] wxyz (unnormalized ok).
        scales: [N,3] post-activation scales.
        opacities: [N] post-activation opacity.
        active: [N] bool particle-alive mask (capacity model).
    """
    n_sigma_d = 3
    lam = cfg.alpha * cfg.alpha * (n_sigma_d + cfg.kappa) - n_sigma_d
    w0 = lam / (n_sigma_d + lam)
    wi = 1.0 / (2.0 * (n_sigma_d + lam))
    w0_cov = w0 + (1.0 - cfg.alpha * cfg.alpha + cfg.beta)

    rot = quat_to_rotmat(quat_normalize(quats))  # [N,3,3] local->world

    # sigma points: mean, mean +- delta * scale_i * R[:, i]
    axes = rot * scales[:, None, :]               # [N, 3(world), 3(axis i)]
    deltas = cfg.delta * jnp.moveaxis(axes, -1, 1)  # [N, 3(axis), 3(world)]
    sigma_pts = jnp.concatenate([
        positions[:, None, :],
        positions[:, None, :] + deltas,
        positions[:, None, :] - deltas,
    ], axis=1)                                    # [N, 7, 3]

    proj, valid_pt = project_point_with_shutter(
        cam, sigma_pts, tolerance=cfg.image_margin_factor,
        n_iterations=cfg.n_rolling_shutter_iterations)
    # NOTE (parity): the reference accumulates the *last written* projection
    # of invalid sigma points (uninitialized-on-failure in CUDA is actually
    # the clipped value written by projectPoint; cuh:104-115 always writes).
    # projectPoint here also always writes a clipped value -> same behavior.
    num_valid = jnp.sum(valid_pt.astype(jnp.int32), axis=1)

    center = w0 * proj[:, 0, :] + wi * jnp.sum(proj[:, 1:, :], axis=1)
    centered = proj - center[:, None, :]
    weights = jnp.concatenate([
        jnp.full((1,), w0_cov, jnp.float32),
        jnp.full((2 * n_sigma_d,), wi, jnp.float32),
    ])
    cov_xx = jnp.sum(weights * centered[..., 0] * centered[..., 0], axis=1)
    cov_xy = jnp.sum(weights * centered[..., 0] * centered[..., 1], axis=1)
    cov_yy = jnp.sum(weights * centered[..., 1] * centered[..., 1], axis=1)

    if cfg.require_all_sigma_points:
        valid = num_valid == (2 * n_sigma_d + 1)
    else:
        valid = num_valid > 0

    # opacity threshold + min sensor z (gutProjector.cuh:131-139)
    sensor_ray = positions - sensor_position(cam)
    rot_wc = quat_to_rotmat(cam.q_start)
    z_sensor = jnp.einsum("j,...j->...", rot_wc[2], positions, precision="highest") + cam.t_start[2]
    valid = valid & (opacities >= cfg.alpha_threshold) & (z_sensor >= cfg.min_sensor_z)
    valid = valid & active

    # conic / extent (gutProjector.cuh:81-116)
    dil_xx = cov_xx + cfg.covariance_dilation
    dil_yy = cov_yy + cfg.covariance_dilation
    det_dil = dil_xx * dil_yy - cov_xy * cov_xy
    det_safe = jnp.where(det_dil == 0.0, 1.0, det_dil)
    conic = jnp.stack([dil_yy, -cov_xy, dil_xx], axis=-1) / det_safe[:, None]
    if cfg.mip_splatting_scaling:
        det_raw = cov_xx * cov_yy - cov_xy * cov_xy
        conv = jnp.sqrt(jnp.maximum(2.5e-5, det_raw / det_safe))
        opacity = opacities * conv
    else:
        opacity = opacities
    valid = valid & (det_dil != 0.0) & (opacity >= cfg.alpha_threshold)

    max_power = jnp.log(jnp.maximum(opacity, 1e-30) / cfg.alpha_threshold)
    if cfg.tight_opacity_bounding:
        extent_factor = jnp.minimum(3.33, jnp.sqrt(2.0 * jnp.maximum(max_power, 0.0)))
    else:
        extent_factor = jnp.full_like(max_power, 3.33)
    mid = 0.5 * (dil_xx + dil_yy)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.01, mid * mid - det_dil))
    radius = extent_factor * jnp.sqrt(lam_max)
    if cfg.rect_bounding:
        ext = jnp.minimum(
            extent_factor[:, None] * jnp.sqrt(jnp.stack([dil_xx, dil_yy], axis=-1)),
            radius[:, None])
    else:
        ext = jnp.stack([radius, radius], axis=-1)
    valid = valid & (radius > 0.0)

    dist = jnp.linalg.norm(sensor_ray, axis=-1)
    view_dir = sensor_ray / jnp.maximum(dist, 1e-12)[:, None]
    depth = z_sensor if cfg.global_z_order else dist

    return Projection(valid=valid, center=center, conic=conic,
                      opacity=opacity,
                      extent=jnp.where(valid[:, None], ext, 0.0),
                      depth=jnp.where(valid, depth, jnp.inf),
                      view_dir=view_dir)


def sensor_position(cam: CameraModel) -> jnp.ndarray:
    """World-space camera center from the world->camera start pose."""
    rot = quat_to_rotmat(cam.q_start)
    return -jnp.einsum("ij,i->j", rot, cam.t_start, precision="highest")


def tile_bbox(center: jnp.ndarray, extent: jnp.ndarray, tile_grid):
    """Tile-space bounding boxes (gutProjector.cuh:32-43).

    Returns (min_xy, max_xy) int32 [N,2] with max exclusive.
    """
    gx, gy = tile_grid
    lo = jnp.stack([
        jnp.clip(jnp.floor((center[:, 0] - 0.5 - extent[:, 0]) / TILE_X), 0, gx),
        jnp.clip(jnp.floor((center[:, 1] - 0.5 - extent[:, 1]) / TILE_Y), 0, gy),
    ], axis=-1).astype(jnp.int32)
    hi = jnp.stack([
        jnp.clip(jnp.ceil((center[:, 0] - 0.5 + extent[:, 0]) / TILE_X), 0, gx),
        jnp.clip(jnp.ceil((center[:, 1] - 0.5 + extent[:, 1]) / TILE_Y), 0, gy),
    ], axis=-1).astype(jnp.int32)
    return lo, hi


def tile_min_power_response(tile_xy: jnp.ndarray, conic: jnp.ndarray,
                            opacity: jnp.ndarray, center: jnp.ndarray):
    """Minimum conic power over a tile footprint (gutProjector.cuh:49-78).

    tile_xy: [..., 2] integer tile coordinates (float ok).
    Returns the minimal 0.5*x^T Conic x over the tile; 0 if the mean is
    inside the tile.
    """
    tile_size = jnp.array([TILE_X, TILE_Y], jnp.float32)
    tile_min = tile_size * tile_xy
    tile_max = tile_min + tile_size
    min_offset = tile_min - center
    left_above = (min_offset > 0.0).astype(jnp.float32)
    beyond = jnp.stack([
        left_above[..., 0] + (center[..., 0] > tile_max[..., 0]),
        left_above[..., 1] + (center[..., 1] > tile_max[..., 1]),
    ], axis=-1)
    outside = (beyond[..., 0] + beyond[..., 1]) > 0.0

    p = tile_max * (1.0 - left_above) + tile_min * left_above
    dxy = jnp.sign(min_offset) * tile_size
    dxy = jnp.where(min_offset == 0.0, tile_size, dxy)  # copysign(+0)=+1
    diff = center - p
    a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
    rcp_x = 1.0 / (tile_size[0] * tile_size[0] * a)
    rcp_y = 1.0 / (tile_size[1] * tile_size[1] * c)
    tx = beyond[..., 1] * jnp.clip(
        (dxy[..., 0] * a * diff[..., 0] + dxy[..., 0] * b * diff[..., 1]) * rcp_x, 0.0, 1.0)
    ty = beyond[..., 0] * jnp.clip(
        (dxy[..., 1] * b * diff[..., 0] + dxy[..., 1] * c * diff[..., 1]) * rcp_y, 0.0, 1.0)
    min_pos = jnp.stack([p[..., 0] + tx * dxy[..., 0],
                         p[..., 1] + ty * dxy[..., 1]], axis=-1)
    d = center - min_pos
    power = (0.5 * (a * d[..., 0] * d[..., 0] + c * d[..., 1] * d[..., 1])
             + b * d[..., 0] * d[..., 1])
    return jnp.where(outside, power, 0.0)

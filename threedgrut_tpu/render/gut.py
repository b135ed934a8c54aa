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

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState
from ..ops import binning as binning_ops
from ..ops import ut as ut_ops
from ..ops.cameras import CameraModel
from ..ops.pallas.raster import CHUNK, RECORD_DIM, rasterize_tiles
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


def unpack_tiles(out, grid, height, width):
    """[T, 256, 8] -> [H, W, 8] (cropping padding)."""
    gx, gy = grid
    img = out.reshape(gy, gx, TILE_Y, TILE_X, 8)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * TILE_Y, gx * TILE_X, 8)
    return img[:height, :width]


def render_gut(cam: CameraModel, ut_cfg: UTConfig, raster_cfg: RasterConfig,
               model: GaussianState, sh_degree: int,
               rays: Optional[tuple] = None,
               interpret: Optional[bool] = None):
    """Render one view with the 3DGUT pipeline.

    Args:
        rays: optional (ray_o [H,W,3], ray_d [H,W,3]) world-space override
            (defaults to camera raygen through the start pose).
        sh_degree: active SH degree (static -> specializes the compile,
            mirroring the reference's compile-time defines).
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

    # per-particle radiance from the sensor->particle direction
    # (PerRayParticleFeatures=false; gutProjector.cuh:306-310), clamped at 0
    # like the renderer's tcnn::max(features, 0) fetch.
    feats = eval_sh_radiance(model.sh_coeffs(), proj.view_dir, sh_degree)
    feats = jnp.maximum(feats, 0.0)

    b = binning_ops.bin_particles(
        proj, grid, raster_cfg.max_pairs, chunk=CHUNK,
        tile_culling=raster_cfg.tile_culling,
        alpha_threshold=ut_cfg.alpha_threshold)

    # the hot path (camera rays, global shutter) has one shared ray origin
    # -> the kernel can use the factorized MXU response (chunk_hits_fast)
    from ..ops.cameras import ShutterType
    shared_origin = (rays is None
                     and cam.shutter_type == int(ShutterType.GLOBAL))

    # pair records (differentiable gather from model params), laid out as
    # [C, 16, CHUNK] contiguous chunk blocks for single-DMA streaming
    idx = jnp.maximum(b.pair_particle, 0)
    pad_valid = (b.pair_particle >= 0).astype(jnp.float32)[:, None]
    quats = quat_normalize(model.params.rotation)
    p_total = b.pair_particle.shape[0]
    if shared_origin:
        # per-particle quadratic-form precompute (see chunk_hits_fast)
        from ..ops.quaternion import quat_to_rotmat
        from ..ops.ut import sensor_position
        origin = sensor_position(cam)
        rot = quat_to_rotmat(quats)                       # [C,3,3]
        inv_s2 = 1.0 / jnp.square(model.get_scale())      # [C,3]
        # A = R diag(1/s^2) R^T
        a_full = jnp.einsum("nij,nj,nkj->nik", rot, inv_s2, rot,
                            precision="highest")          # [C,3,3]
        delta = origin - model.params.positions           # [C,3]
        u = jnp.einsum("nij,nj->ni", a_full, delta,
                       precision="highest")               # [C,3]
        g2 = jnp.sum(u * delta, axis=1, keepdims=True)    # |M delta|^2
        a6 = jnp.stack([a_full[:, 0, 0], a_full[:, 1, 1], a_full[:, 2, 2],
                        a_full[:, 0, 1], a_full[:, 0, 2], a_full[:, 1, 2]],
                       axis=1)
        records = jnp.concatenate([
            u[idx], a6[idx], g2[idx],
            model.get_density()[idx] * pad_valid,
            feats[idx],
            jnp.zeros((p_total, RECORD_DIM - 14), jnp.float32),
        ], axis=1)
    else:
        records = jnp.concatenate([
            model.params.positions[idx],
            quats[idx],
            model.get_scale()[idx],
            model.get_density()[idx] * pad_valid,
            feats[idx],
            jnp.zeros((p_total, RECORD_DIM - 14), jnp.float32),
        ], axis=1)
    n_chunks = p_total // CHUNK
    records = records.reshape(n_chunks, CHUNK, RECORD_DIM).transpose(0, 2, 1)

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

    cfg_static = (raster_cfg.kernel_degree, raster_cfg.min_response,
                  raster_cfg.min_alpha, raster_cfg.max_alpha,
                  raster_cfg.min_transmittance, shared_origin)
    out = rasterize_tiles(records, b.tile_start, rays_packed,
                          cfg_static, interpret)

    img = unpack_tiles(out, grid, h, w)
    return {
        "pred_features": img[..., 0:3],
        "pred_opacity": img[..., 3:4],
        "pred_dist": img[..., 4:5],
        "hits_count": img[..., 5:6],
        "mog_visibility": proj.valid,
        "num_pairs": b.num_pairs,
        "pairs_overflow": b.overflow,
    }

"""Pure-JAX reference renderer (correctness oracle for the Pallas kernels).

Renders every pixel against every particle in global depth order,
reproducing the exact semantics of the production pipeline (tile bbox
membership, per-tile conic culling, 3D density hit, front-to-back
compositing with early termination) without any binning/sorting machinery.
O(pixels x particles): use only in tests on tiny scenes.

Semantics sources:
- binning/culling: threedgut_tracer .../renderers/gutProjector.cuh
- hit + compositing: .../renderers/gutKBufferRenderer.cuh:407-529 (K=0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState
from ..ops import ut as ut_ops
from ..ops.cameras import CameraModel
from ..ops.hit import density_hit, hit_normal
from ..ops.sh import eval_sh_radiance
from ..ops.ut import TILE_X, TILE_Y, UTConfig
from .common import RasterConfig, camera_rays_world


def render_oracle(cam: CameraModel, ut_cfg: UTConfig, raster_cfg: RasterConfig,
                  model: GaussianState, sh_degree: int):
    """Render a full image. Returns dict with pred_features [H,W,3],
    pred_opacity [H,W,1], pred_dist [H,W,1], hits_count [H,W,1]."""
    w, h = cam.resolution
    proj = ut_ops.unscented_projection(
        cam, ut_cfg, model.params.positions, model.params.rotation,
        model.get_scale(), model.get_density()[:, 0], model.active_mask())

    # precomputed per-particle features from the sensor->particle direction
    # (PerRayParticleFeatures=false for SH; gutProjector.cuh:306-310)
    feats = eval_sh_radiance(model.sh_coeffs(), proj.view_dir, sh_degree)
    feats = jnp.maximum(feats, 0.0)  # tcnn::max(features, 0) in renderer

    # global depth order
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))

    gx = (w + TILE_X - 1) // TILE_X
    gy = (h + TILE_Y - 1) // TILE_Y

    lo, hi = ut_ops.tile_bbox(proj.center, proj.extent, (gx, gy))

    ray_o, ray_d = camera_rays_world(cam)
    # same per-ray AABB t-range clip as the production path
    from .gut import _ray_aabb, _scene_aabb
    bb_lo, bb_hi = _scene_aabb(model)
    tmin, tmax = _ray_aabb(ray_o, ray_d, bb_lo, bb_hi)

    positions = model.params.positions[order]
    quats = model.params.rotation[order]
    scales = model.get_scale()[order]
    dens = model.get_density()[order, 0]
    feats_o = feats[order]
    valid_o = proj.valid[order]
    lo_o, hi_o = lo[order], hi[order]
    conic_o = proj.conic[order]
    opac_o = proj.opacity[order]
    center_o = proj.center[order]

    def render_pixel(o, d, px, py, t_min_ray, t_max_ray):
        tx = px // TILE_X
        ty = py // TILE_Y

        def body(carry, i):
            transmittance, feat, depth, hits, normal = carry
            in_bbox = ((tx >= lo_o[i, 0]) & (tx < hi_o[i, 0])
                       & (ty >= lo_o[i, 1]) & (ty < hi_o[i, 1]))
            if raster_cfg.tile_culling:
                power = ut_ops.tile_min_power_response(
                    jnp.stack([tx, ty]).astype(jnp.float32), conic_o[i],
                    opac_o[i], center_o[i])
                max_power = jnp.log(jnp.maximum(opac_o[i], 1e-30)
                                    / ut_cfg.alpha_threshold)
                in_bbox = in_bbox & (power < max_power)
            hit = density_hit(
                o, d, positions[i], quats[i], scales[i], dens[i],
                kernel_degree=raster_cfg.kernel_degree,
                min_response=raster_cfg.min_response,
                min_alpha=raster_cfg.min_alpha,
                max_alpha=raster_cfg.max_alpha)
            alive = transmittance >= raster_cfg.min_transmittance
            a = jnp.where(in_bbox & valid_o[i] & alive
                          & (hit.hit_t > t_min_ray)
                          & (hit.hit_t < t_max_ray),
                          hit.alpha, 0.0)
            weight = a * transmittance
            feat = feat + weight * feats_o[i]
            depth = depth + weight * hit.hit_t
            hits = hits + (weight > 0.0).astype(jnp.int32)
            if raster_cfg.enable_normals:
                n = hit_normal(o, d, positions[i], quats[i], scales[i])
                normal = normal + weight * n
            transmittance = transmittance * (1.0 - a)
            return (transmittance, feat, depth, hits, normal), None

        init = (jnp.asarray(1.0), jnp.zeros(3), jnp.asarray(0.0),
                jnp.asarray(0, jnp.int32), jnp.zeros(3))
        (transmittance, feat, depth, hits, normal), _ = jax.lax.scan(
            body, init, jnp.arange(positions.shape[0]))
        return feat, 1.0 - transmittance, depth, hits, normal

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    feat, alpha, depth, hits, normal = jax.vmap(jax.vmap(render_pixel))(
        ray_o, ray_d, xs, ys, tmin, tmax)
    out = {
        "pred_features": feat,
        "pred_opacity": alpha[..., None],
        "pred_dist": depth[..., None],
        "hits_count": hits[..., None],
        "mog_visibility": proj.valid,
    }
    if raster_cfg.enable_normals:
        out["pred_normals"] = normal
    return out

"""Depth-sliced particle parallelism over a device mesh (TPU-native).

The reference is single-GPU; this is new design for the TPU mesh
(SURVEY.md section 5.8 b/c). Data-parallel band sharding (parallel/dp.py)
replicates ALL pair work per device; this module instead shards the
*particles*:

1. every device ranks the active particles by view depth (the same key
   the binning sort uses, so global compositing order is preserved),
2. device d keeps the contiguous depth slab of ranks
   [d*ceil(n/D), (d+1)*ceil(n/D)) by zeroing the opacity of all other
   particles (no data movement - parameters are replicated and small;
   pair/binning/raster work scales 1/D because culled particles emit no
   pairs),
3. each device composites its slab over the full image with the
   unchanged single-chip pipeline -> per-device partials (feat_d, T_d),
4. alpha compositing is associative across depth-partitioned slabs:
       C = sum_d (prod_{d'<d} T_d') C_d,   T = prod_d T_d
   so the cross-device combine is an exclusive product scan over the
   mesh axis (implemented with one all_gather of the per-device
   partials - H*W*(F+5)*4 bytes per device over ICI).

Semantics vs single chip: exact up to the min_transmittance kill
threshold - a ray killed mid-slab on one chip frees later slabs from
work they'd skip serially; contributions past the kill point carry
weight < min_transmittance (default 1e-4). Differentiable end to end
(shard_map + all_gather are differentiable; per-parameter gradients psum
over the axis, and each particle's gradient comes only from its owning
slab).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.gaussians import GaussianState
from ..ops.cameras import CameraModel
from ..ops.ut import UTConfig
from ..render.common import RasterConfig
from ..render.gut import render_gut


def _slab_mask(model: GaussianState, cam: CameraModel, ut_cfg: UTConfig,
               axis: str):
    """Boolean mask of the particles owned by this device's depth slab."""
    from ..ops.quaternion import quat_to_rotmat
    from ..ops.ut import sensor_position

    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    # identical key to ops/ut.py unscented_projection so the slab
    # partition nests exactly inside the global compositing order
    if ut_cfg.global_z_order:
        r_wc = quat_to_rotmat(cam.q_start)
        depth = (model.params.positions @ r_wc[2, :]) + cam.t_start[2]
    else:
        depth = jnp.linalg.norm(
            model.params.positions - sensor_position(cam), axis=-1)
    active = model.active_mask()
    key = jnp.where(active, depth, jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.argsort(order)          # particle -> depth rank
    per = (model.n_active + n_dev - 1) // n_dev
    lo = d * per
    return active & (rank >= lo) & (rank < lo + per)


def _mask_model(model: GaussianState, mask: jnp.ndarray) -> GaussianState:
    """Zero the opacity of particles outside ``mask`` (raw-density mask:
    activation maps -1e9 to ~0 opacity, so they emit no pairs)."""
    dens = jnp.where(mask[:, None], model.params.density, -1e9)
    return model.replace(params=model.params.replace(density=dens))


def combine_slabs(feat, opac, depth, hits, tfin, axis: str):
    """Ordered cross-slab composite along a mesh axis.

    All inputs are per-device [H, W, c] partials (slab d on device d,
    front slabs on low device ids). Returns the combined partials on
    every device (replicated result).
    """
    parts = jax.lax.all_gather(
        jnp.concatenate([feat, opac, depth, hits, tfin], axis=-1), axis)
    f = feat.shape[-1]
    feat_g = parts[..., 0:f]
    depth_g = parts[..., f + 1:f + 2]
    hits_g = parts[..., f + 2:f + 3]
    t_g = parts[..., f + 3:f + 4]
    # exclusive prefix product of slab transmittances over the device dim
    prefix = jnp.cumprod(t_g, axis=0) / jnp.maximum(t_g, 1e-20)
    feat_c = jnp.sum(prefix * feat_g, axis=0)
    depth_c = jnp.sum(prefix * depth_g, axis=0)
    hits_c = jnp.sum(hits_g, axis=0)
    t_c = jnp.prod(t_g, axis=0)
    return feat_c, 1.0 - t_c, depth_c, hits_c, t_c


def render_depth_sliced(cam: CameraModel, ut_cfg: UTConfig,
                        raster_cfg: RasterConfig, model: GaussianState,
                        sh_degree: int, axis: str = "mp"):
    """Per-device body (call inside shard_map over ``axis``)."""
    mask = _slab_mask(model, cam, ut_cfg, axis)
    local = _mask_model(model, mask)
    out = render_gut(cam, ut_cfg, raster_cfg, local, sh_degree)
    tfin = 1.0 - out["pred_opacity"]
    feat, opac, depth, hits, _ = combine_slabs(
        out["pred_features"], out["pred_opacity"], out["pred_dist"],
        out["hits_count"], tfin, axis)
    return {
        "pred_features": feat,
        "pred_opacity": opac,
        "pred_dist": depth,
        "hits_count": hits,
        "mog_visibility": jax.lax.psum(
            (out["mog_visibility"] & mask).astype(jnp.int32), axis) > 0,
    }


def make_sliced_render(mesh: Mesh, ut_cfg: UTConfig,
                       raster_cfg: RasterConfig, base_model: GaussianState,
                       sh_degree: int, axis: str = "mp"):
    """jit-able full-image renderer sharding particles by depth slab."""

    def body(params_d, n_active, cam):
        model = base_model.replace(
            params=base_model.params.replace(**params_d),
            n_active=n_active)
        out = render_depth_sliced(cam, ut_cfg, raster_cfg, model,
                                  sh_degree, axis)
        # identical on all devices after the combine
        return out["pred_features"], out["pred_opacity"], out["pred_dist"]

    fn = jax.shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                       out_specs=P(), check_vma=False)
    return jax.jit(fn)


def make_sliced_train_step(mesh: Mesh, ut_cfg: UTConfig,
                           raster_cfg: RasterConfig,
                           base_model: GaussianState, sh_degree: int,
                           axis: str = "mp", lambda_l1: float = 0.8,
                           lambda_ssim: float = 0.2, eps: float = 1e-15):
    """Particle-sharded training step: forward + ordered combine + loss
    on the combined image; parameter gradients psum over the axis (each
    particle's gradient originates only from its owning slab)."""
    from ..ops.ssim import ssim
    from ..optimizers import adam as adam_mod

    def device_loss(params_d, rgb_gt, n_active, cam):
        model = base_model.replace(
            params=base_model.params.replace(**params_d),
            n_active=n_active)
        out = render_depth_sliced(cam, ut_cfg, raster_cfg, model,
                                  sh_degree, axis)
        pred = out["pred_features"]
        l1 = jnp.mean(jnp.abs(pred - rgb_gt))
        s = ssim(pred.transpose(2, 0, 1)[None],
                 rgb_gt.transpose(2, 0, 1)[None])
        return lambda_l1 * l1 + lambda_ssim * (1.0 - s)

    def per_device(params_d, rgb_gt, n_active, cam):
        loss, grads = jax.value_and_grad(device_loss)(
            params_d, rgb_gt, n_active, cam)
        # every device computes the same combined-image loss, so the
        # all_gather transpose scales each slab's cotangent by D; pmean
        # both assembles the full-parameter gradient (slabs are disjoint)
        # and removes that factor
        grads = jax.lax.pmean(grads, axis)
        return jax.lax.pmean(loss, axis), grads

    sharded = jax.shard_map(per_device, mesh=mesh,
                            in_specs=(P(), P(), P(), P()),
                            out_specs=(P(), P()), check_vma=False)

    @jax.jit
    def step(params_d, opt_state, lrs, rgb_gt, n_active, cam):
        loss, grads = sharded(params_d, rgb_gt, n_active, cam)
        active = jnp.arange(base_model.capacity,
                            dtype=jnp.int32) < n_active
        new_p, new_o = adam_mod.adam_step(params_d, grads, opt_state, lrs,
                                          eps=eps, update_mask=active)
        return new_p, new_o, {"total": loss}

    return step


def make_dp_sliced_train_step(mesh: Mesh, cam_template: CameraModel,
                              ut_cfg: UTConfig, raster_cfg: RasterConfig,
                              base_model: GaussianState, sh_degree: int,
                              lambda_l1: float = 1.0, eps: float = 1e-15):
    """Combined data x particle parallelism over a 2D ("dp", "mp") mesh.

    Each device owns (image row band over "dp") x (depth slab over
    "mp"): the gt image shards on rows across "dp" and is replicated
    across "mp"; parameters replicate everywhere. Per device: render the
    band camera with the slab-masked model, exclusive-product combine
    over "mp" (combine_slabs) to assemble the band image, L1 band loss.
    Gradients pmean over "mp" (slabs are disjoint; removes the
    all-gather transpose's D factor, see make_sliced_train_step) then
    psum over "dp" (band partials sum to the image-wide loss). L1 only:
    the exact halo-exchange SSIM of parallel/dp.py composes with "mp"
    the same way but is not needed for the sharding dryrun.
    """
    from ..parallel.dp import band_camera
    from ..optimizers import adam as adam_mod

    n_dp = mesh.shape["dp"]
    full_h = cam_template.resolution[1]
    assert full_h % (16 * n_dp) == 0, (
        "image height must split into 16-px tile bands across dp")
    band_h = full_h // n_dp
    band_cam_static = band_camera(cam_template, band_h)

    def device_loss(params_d, gt_band, n_active, cam):
        dev = jax.lax.axis_index("dp")
        principal = cam.principal - jnp.array(
            [0.0, band_h], jnp.float32) * dev.astype(jnp.float32)
        cam_b = band_cam_static.replace(
            focal=cam.focal, principal=principal, radial=cam.radial,
            tangential=cam.tangential, thin_prism=cam.thin_prism,
            max_angle=cam.max_angle,
            ftheta_angle_to_pixeldist=cam.ftheta_angle_to_pixeldist,
            ftheta_pixeldist_to_angle=cam.ftheta_pixeldist_to_angle,
            ftheta_linear_cde=cam.ftheta_linear_cde,
            t_start=cam.t_start, q_start=cam.q_start,
            t_end=cam.t_end, q_end=cam.q_end)
        model = base_model.replace(
            params=base_model.params.replace(**params_d),
            n_active=n_active)
        out = render_depth_sliced(cam_b, ut_cfg, raster_cfg, model,
                                  sh_degree, "mp")
        l1 = jnp.mean(jnp.abs(out["pred_features"] - gt_band))
        return lambda_l1 * l1 / n_dp

    def per_device(params_d, gt_band, n_active, cam):
        loss, grads = jax.value_and_grad(device_loss)(
            params_d, gt_band, n_active, cam)
        grads = jax.lax.pmean(grads, "mp")
        grads = jax.lax.psum(grads, "dp")
        loss = jax.lax.pmean(jax.lax.psum(loss, "dp"), "mp")
        return loss, grads

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P("dp", None, None), P(), P()),
        out_specs=(P(), P()), check_vma=False)

    @jax.jit
    def step(params_d, opt_state, lrs, rgb_gt, n_active, cam):
        loss, grads = sharded(params_d, rgb_gt, n_active, cam)
        active = jnp.arange(base_model.capacity,
                            dtype=jnp.int32) < n_active
        new_p, new_o = adam_mod.adam_step(params_d, grads, opt_state, lrs,
                                          eps=eps, update_mask=active)
        return new_p, new_o, {"total": loss}

    return step

"""Multi-chip parallel rendering/training via jax.sharding + shard_map.

The reference is strictly single-GPU (SURVEY.md section 2.7); this module
is new TPU-native design: the image is split into horizontal tile bands,
one band per device along the ``dp`` mesh axis. Each device renders its
band with the full single-chip pipeline against *replicated* particle
parameters (tens of MB - cheap), computes its share of the loss, and
gradients are reduced with ``psum`` over ICI. No reference code maps to
this; it replaces nothing and scales everything.

Band rendering reuses the standard pipeline unchanged by *cropping the
camera*: a horizontal band of a pinhole/fisheye image is the same camera
with the principal point shifted by the band offset - so projection,
binning and the Pallas kernel are oblivious to sharding.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import background as bg_mod
from ..models.gaussians import GaussianState
from ..ops.cameras import CameraModel
from ..ops.ssim import ssim_map
from ..ops.ut import UTConfig
from ..optimizers import adam as adam_mod
from ..render.common import RasterConfig
from ..render.gut import render_gut


def band_camera(cam: CameraModel, band_height: int) -> CameraModel:
    """Static part of a band camera: full width, band_height rows."""
    return cam.replace(resolution=(cam.resolution[0], band_height))


def make_dp_train_step(mesh: Mesh, cam_template: CameraModel,
                       ut_cfg: UTConfig, raster_cfg: RasterConfig,
                       base_model: GaussianState, sh_degree: int,
                       loss_lambda_l1: float = 0.8,
                       loss_lambda_ssim: float = 0.2,
                       eps: float = 1e-15):
    """Build a pjit-ted data-parallel training step.

    Sharding layout:
      params/opt-state: replicated,
      rgb_gt [H, W, 3]: sharded on rows (H) across ``dp``,
      per-device band principal offset: computed from the device index.

    Returns step(params_d, opt_state, lrs, rgb_gt, n_active, cam) ->
    (params, opt_state, metrics).
    """
    n_dev = mesh.shape["dp"]
    full_h = cam_template.resolution[1]
    assert full_h % (16 * n_dev) == 0, (
        "image height must split into 16-px tile bands across devices")
    band_h = full_h // n_dev
    band_cam_static = band_camera(cam_template, band_h)

    window = 11
    radius = window // 2
    full_w = cam_template.resolution[0]
    # total valid 11x11 windows of the FULL image (exact fused-ssim
    # semantics; see device_loss halo exchange)
    n_windows = 3 * (full_h - window + 1) * (full_w - window + 1)

    def _halo_rows(x, r):
        """Ring-exchange r edge rows with band neighbors (differentiable
        ppermute; gradients flow back to the producing device). The
        wrap-around rows at the outer image edges only feed windows that
        the validity mask drops."""
        n = jax.lax.axis_size("dp")
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        top_halo = jax.lax.ppermute(x[-r:], "dp", fwd)   # prev's bottom
        bot_halo = jax.lax.ppermute(x[:r], "dp", bwd)    # next's top
        return jnp.concatenate([top_halo, x, bot_halo], axis=0)

    def device_loss(params_d, rgb_gt_band, n_active, cam):
        """Runs per device inside shard_map; rgb_gt_band: [band_h, W, 3]."""
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
            params=base_model.params.replace(**params_d), n_active=n_active)
        out = render_gut(cam_b, ut_cfg, raster_cfg, model, sh_degree)
        pred = out["pred_features"]
        l1 = jnp.mean(jnp.abs(pred - rgb_gt_band))
        # EXACT full-image SSIM: exchange `radius` boundary rows so
        # windows crossing band boundaries are evaluated by the band
        # owning their center row, then mask to full-image-valid
        # windows and normalize by the global window count.
        pred_ext = _halo_rows(pred, radius)
        gt_ext = _halo_rows(rgb_gt_band, radius)
        smap = ssim_map(pred_ext.transpose(2, 0, 1)[None],
                        gt_ext.transpose(2, 0, 1)[None], window)
        # map row j <-> window center at full-image row dev*band_h + j
        centers = dev * band_h + jnp.arange(band_h)
        valid = ((centers >= radius)
                 & (centers <= full_h - 1 - radius)).astype(smap.dtype)
        s = jnp.sum(smap * valid[None, None, :, None]) / n_windows
        # per-device partial losses; the psum in per_device completes
        # the image-wide means (grads psum'd identically)
        loss = (loss_lambda_l1 * l1 / n_dev
                + loss_lambda_ssim * (1.0 / n_dev - s))
        return loss, l1

    def sharded_grads(params_d, rgb_gt, n_active, cam):
        def per_device(params_d, gt_band, n_active, cam):
            (loss, l1), grads = jax.value_and_grad(
                device_loss, has_aux=True)(params_d, gt_band, n_active, cam)
            # device_loss returns 1/n_dev partial losses -> SUM completes
            # the image-wide loss and its gradient
            grads = jax.lax.psum(grads, "dp")
            loss = jax.lax.psum(loss, "dp")
            l1 = jax.lax.pmean(l1, "dp")
            return loss, l1, grads

        return jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P("dp", None, None), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(params_d, rgb_gt, n_active, cam)

    @jax.jit
    def step(params_d, opt_state, lrs, rgb_gt, n_active, cam):
        loss, l1, grads = sharded_grads(params_d, rgb_gt, n_active, cam)
        cap = base_model.capacity
        active = jnp.arange(cap, dtype=jnp.int32) < n_active
        new_params, new_opt = adam_mod.adam_step(
            params_d, grads, opt_state, lrs, eps=eps, update_mask=active)
        return new_params, new_opt, {"total": loss, "l1": l1}

    return step


def replicate_to_mesh(mesh: Mesh, tree):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_image_rows(mesh: Mesh, img):
    return jax.device_put(img, NamedSharding(mesh, P("dp", None, None)))

"""Batched fwd-only serving renderer (the deployment/eval hot path).

The reference's eval FPS (README.md:395-412, 846 FPS on RTX 5090) is
measured on a frozen model rendering a stream of views. On TPU the
per-dispatch runtime overhead (program launch, output staging,
host sync) is a large fraction of a single sub-20 ms frame, so the
serving path renders a BATCH of views per dispatch with one
``lax.scan`` over the stacked camera pytree — the per-dispatch cost
amortizes across the batch while every per-view program stays the
static-shape pipeline XLA already compiles.

Training-only machinery is dropped at trace time:
  * ``grad_fold=False``: binning skips the gradient-fold permutation
    carry (cheaper pair sort) and records use a plain gather (no
    custom-VJP residuals).
  * no normals / weight-telemetry outputs; the fwd raster runs without
    a VJP trace so XLA dead-code-eliminates every residual.
  * model parameters are closed over as device constants — uploaded
    once, reused by every dispatch (axon upload-leak rule, NOTES.md).

Use ``scripts/eval_fps.py --batch N`` for the calibrated measurement.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState
from ..ops.cameras import CameraModel
from ..ops.ut import UTConfig
from .common import RasterConfig
from .gut import render_gut


def stack_cameras(cams):
    """Stack a list of same-static CameraModels into one scan-able pytree.

    All cameras must share the static fields (resolution, model type,
    shutter); the traced leaves (pose, intrinsics) gain a leading batch
    dim.
    """
    first = cams[0]
    for c in cams[1:]:
        if (c.resolution != first.resolution
                or c.model_type != first.model_type
                or c.shutter_type != first.shutter_type):
            raise ValueError("stack_cameras needs uniform camera statics")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def serving_raster_config(rc: RasterConfig) -> RasterConfig:
    """Trim a training RasterConfig down to the serving semantics."""
    return dataclasses.replace(rc, grad_fold=False, enable_normals=False,
                               aligned_segments=False)


def make_serving_renderer(model: GaussianState, raster_cfg: RasterConfig,
                          sh_degree: int,
                          ut_cfg: Optional[UTConfig] = None,
                          background: Optional[jnp.ndarray] = None):
    """Build a jitted ``render(cams_stacked) -> [B, H, W, 3]`` function.

    ``cams_stacked`` comes from :func:`stack_cameras`; the batch size is
    a compile-time constant per distinct B. ``background`` (optional
    [3]) is composited against the residual transmittance, matching the
    eval renderer's blend (render.py).
    """
    ut_cfg = ut_cfg or UTConfig()
    rc = serving_raster_config(raster_cfg)
    bg = (jnp.zeros(3, jnp.float32) if background is None
          else jnp.asarray(background, jnp.float32))

    @jax.jit
    def render(cams_stacked: CameraModel):
        def body(carry, cam):
            out = render_gut(cam, ut_cfg, rc, model, sh_degree=sh_degree)
            rgb = (out["pred_features"]
                   + (1.0 - out["pred_opacity"]) * bg)
            return carry, rgb

        _, imgs = jax.lax.scan(body, 0, cams_stacked)
        return imgs

    return render

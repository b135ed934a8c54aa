"""Learned post-processing (PPISP) + linear->sRGB.

The reference integrates the external ``ppisp`` package (git dep,
requirements_extra.txt:1; trainer hooks threedgrut/trainer.py:462-526):
a per-(camera, frame) learned ISP - exposure, vignetting, white-balance
color transform and camera response function (CRF) - applied to the
rendered radiance before the loss, plus a small controller network that
predicts the per-frame corrections for novel views (distillation phase).

This module is a from-scratch TPU implementation of that capability:

  rgb' = CRF( ColorMatrix( rgb * 2^exposure * vignette(r) ) )

- exposure: per-frame scalar (optionally seeded from EXIF priors),
- vignetting: even-radial polynomial (1 + v1 r^2 + v2 r^4 + v3 r^6),
- color: 3x3 matrix + bias initialized to identity,
- CRF: per-channel gamma-like curve x^(softplus(g)) with learned gain,
- controller: MLP from (camera one-hot, view direction) -> the same
  parameter vector, trained in a post-phase with frozen Gaussians
  (n_distillation_steps; trainer.py:1126-1130).

``linear-to-srgb`` (post_processing.method) is the fixed IEC 61966-2-1
transfer (utils/post_processing_linear_to_srgb.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import linear_to_srgb


def init_ppisp_params(n_cameras: int, n_frames: int,
                      exposure_prior: Optional[np.ndarray] = None) -> Dict:
    """Per-camera/per-frame learnable ISP parameters."""
    exp0 = np.zeros((n_frames,), np.float32)
    if exposure_prior is not None:
        exp0[:len(exposure_prior)] = exposure_prior
    return {
        "exposure": jnp.asarray(exp0),                     # [F] log2
        "vignette": jnp.zeros((n_cameras, 3), jnp.float32),
        "color_matrix": jnp.tile(jnp.eye(3)[None], (n_cameras, 1, 1)),
        "color_bias": jnp.zeros((n_cameras, 3), jnp.float32),
        "crf_gamma": jnp.zeros((n_cameras, 3), jnp.float32),  # softplus-> ~1
        "crf_gain": jnp.zeros((n_cameras, 3), jnp.float32),
    }


def apply_ppisp(params: Dict, rgb: jnp.ndarray, camera_idx: int,
                frame_idx: int, pixel_uv: Optional[jnp.ndarray] = None
                ) -> jnp.ndarray:
    """Apply the learned ISP to rendered radiance.

    rgb: [H, W, 3]; pixel_uv: [H, W, 2] normalized coords in [-1, 1]
    (defaults to a centered grid).
    """
    h, w = rgb.shape[:2]
    if pixel_uv is None:
        ys = (jnp.arange(h) + 0.5) / h * 2.0 - 1.0
        xs = (jnp.arange(w) + 0.5) / w * 2.0 - 1.0
        pixel_uv = jnp.stack(jnp.meshgrid(xs, ys)[::-1][::-1], axis=-1) \
            if False else jnp.stack(
                [jnp.broadcast_to(xs[None, :], (h, w)),
                 jnp.broadcast_to(ys[:, None], (h, w))], axis=-1)

    exposure = 2.0 ** params["exposure"][frame_idx]
    v = params["vignette"][camera_idx]
    r2 = jnp.sum(pixel_uv * pixel_uv, axis=-1, keepdims=True)
    vignette = 1.0 + v[0] * r2 + v[1] * r2 * r2 + v[2] * r2 * r2 * r2
    x = rgb * exposure * jnp.maximum(vignette, 0.0)

    cm = params["color_matrix"][camera_idx]
    x = jnp.einsum("ij,hwj->hwi", cm, x, precision="highest") \
        + params["color_bias"][camera_idx]

    gamma = jax.nn.softplus(params["crf_gamma"][camera_idx] + 0.5413) \
        / jax.nn.softplus(jnp.asarray(0.5413))  # =1 at init
    gain = 2.0 ** params["crf_gain"][camera_idx]
    x = jnp.maximum(x, 1e-8)
    return gain * jnp.power(x, gamma)


class PPISPController:
    """MLP predicting per-frame ISP corrections for novel views
    (the reference's controller CNN distilled to view statistics)."""

    def __init__(self, n_cameras: int, hidden: int = 64, seed: int = 0):
        from flax import linen as nn

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(hidden)(x)
                x = nn.relu(x)
                x = nn.Dense(hidden)(x)
                x = nn.relu(x)
                return nn.Dense(1 + 3 + 3)(x)  # exposure, vignette, bias

            # output layout: [exposure, vignette(3), color_bias(3)]

        self.module = Net()
        self.n_cameras = n_cameras
        dummy = jnp.zeros((1, n_cameras + 3))
        self.params = self.module.init(jax.random.PRNGKey(seed), dummy)

    def predict(self, params, camera_idx: int, view_dir: jnp.ndarray):
        onehot = jax.nn.one_hot(jnp.asarray(camera_idx), self.n_cameras)
        x = jnp.concatenate([onehot, view_dir])[None]
        return self.module.apply(params, x)[0]


def apply_post_processing(method: Optional[str], rgb: jnp.ndarray,
                          ppisp_params: Optional[Dict] = None,
                          camera_idx: int = 0, frame_idx: int = 0
                          ) -> jnp.ndarray:
    """Dispatch matching configs/base_gs.yaml post_processing.method."""
    if method is None or method == "none":
        return rgb
    if method == "linear-to-srgb":
        return linear_to_srgb(rgb)
    if method == "ppisp":
        if ppisp_params is None:
            raise ValueError("ppisp post-processing requires parameters")
        return apply_ppisp(ppisp_params, rgb, camera_idx, frame_idx)
    raise ValueError(f"unknown post_processing method {method}")

"""Learned post-processing (PPISP) + linear->sRGB.

The reference integrates the external ``ppisp`` package (git dep,
requirements_extra.txt:1; trainer hooks threedgrut/trainer.py:462-526):
a per-(camera, frame) learned ISP applied to the rendered radiance
before the loss, plus a controller CNN that predicts per-frame
corrections for novel views (distillation phase).

This module is the trainer-facing facade; the full ISP transform chain
(responsivity -> exposure -> per-channel radial vignetting ->
chromaticity homography -> parametric CRF) and the controller CNN live
in :mod:`threedgrut_tpu.models.ppisp`, matching the runtime SPG shader
semantics (export/usd/post_processing/ppisp_spg/ppisp_usd_spg.cu:199)
and the exported controller architecture contract
(export/usd/post_processing/ppisp_controller_weights.py:84).

``linear-to-srgb`` (post_processing.method) is the fixed IEC 61966-2-1
transfer (utils/post_processing_linear_to_srgb.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import linear_to_srgb
from .ppisp import (PPISPControllerCNN, apply_ppisp_full,  # noqa: F401
                    compute_homography, flatten_controller_weights,
                    init_ppisp_params)


def apply_ppisp(params: Dict, rgb: jnp.ndarray, camera_idx,
                frame_idx, pixel_uv: Optional[jnp.ndarray] = None,
                exposure=None, color_latents=None) -> jnp.ndarray:
    """Apply the learned ISP to rendered radiance ([H, W, 3])."""
    return apply_ppisp_full(params, rgb, camera_idx, frame_idx,
                            exposure=exposure, color_latents=color_latents,
                            pixel_uv=pixel_uv)


class PPISPController:
    """Image-conditioned controller predicting per-frame corrections
    (exposure offset + 8 color latents) for novel views — the reference
    controller CNN (ControllerArchitectureSpec); kept under the round-1
    class name for the trainer/checkpoint surface."""

    def __init__(self, n_cameras: int = 1, seed: int = 0):
        self._cnn = PPISPControllerCNN(seed=seed)
        self.module = self._cnn.module
        self.n_cameras = n_cameras
        self.params = self._cnn.params

    def predict(self, params, img: jnp.ndarray, prior_exposure=0.0):
        """img: [H, W, 3] rendered radiance -> (exposure, latents[8])."""
        return self._cnn.predict(params, img, prior_exposure)

    def flatten_weights(self) -> np.ndarray:
        """Reference export layout (ppisp_controller_weights.py:318)."""
        return flatten_controller_weights(self.params)


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

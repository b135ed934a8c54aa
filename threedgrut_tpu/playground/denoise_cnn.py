"""Learned CNN denoiser for path-traced playground frames.

The reference playground denoises its hybrid path-traced frames with
the OptiX AI denoiser — a pretrained neural network applied as a
post-pass (threedgrut_playground/src/hybridTracer.cpp:503). The
à-trous wavelet filter (playground/denoise.py) is a hand-tuned
stand-in of a lower capability class; this module closes the class
gap with a small learned residual CNN:

  * input: the noisy RGB frame, optionally concatenated with the
    engine's free AOV guides (alpha-blended normals, depth),
  * body: 3x3 convolutions (MXU-friendly: NHWC conv with C a lane
    multiple) with two residual blocks,
  * output: a residual added back to the input (the identity is the
    zero function, so an undertrained net degrades gracefully to a
    no-op instead of destroying the frame).

Weights are trained by ``scripts/train_denoiser.py`` on procedurally
generated playground scenes rendered at 1 SPP (noisy, depth-of-field +
rough-PBR Monte-Carlo noise) against high-SPP references of the same
scenes, and committed as an .npz next to this module. ``denoise_frame``
falls back to the à-trous filter when no weights are available, so the
playground never hard-depends on the artifact.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "denoiser_weights.npz")

# channel widths: 8-multiple keeps the NHWC conv lanes MXU-aligned
_WIDTH = 24
_GUIDE_CH = 7   # rgb(3) + normals(3) + depth(1)


def init_params(key, guides: bool = True):
    """Initialize the CNN parameter pytree (He-normal convs).

    Layout: conv_in [3,3,Cin,W], res{i}_a/res{i}_b [3,3,W,W] x2 blocks,
    conv_out [3,3,W,3]; each with a bias. Total ~29k parameters.
    """
    c_in = _GUIDE_CH if guides else 3
    shapes = {
        "conv_in": (3, 3, c_in, _WIDTH),
        "res0_a": (3, 3, _WIDTH, _WIDTH),
        "res0_b": (3, 3, _WIDTH, _WIDTH),
        "res1_a": (3, 3, _WIDTH, _WIDTH),
        "res1_b": (3, 3, _WIDTH, _WIDTH),
        "conv_out": (3, 3, _WIDTH, 3),
    }
    params = {}
    for name, shp in shapes.items():
        key, k = jax.random.split(key)
        fan_in = shp[0] * shp[1] * shp[2]
        params[name] = {
            "w": jax.random.normal(k, shp, jnp.float32)
            * np.sqrt(2.0 / fan_in),
            "b": jnp.zeros((shp[3],), jnp.float32),
        }
    # zero-init the output conv: the untrained net is exactly identity
    params["conv_out"]["w"] = jnp.zeros_like(params["conv_out"]["w"])
    return params


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def apply_cnn(params, rgb, normals=None, depth=None):
    """Denoise an [H, W, 3] frame (or [N, H, W, 3] batch).

    normals [.., H, W, 3] and depth [.., H, W] / [.., H, W, 1] are the
    engine AOV guides; zeros are substituted when absent (the training
    script randomizes guide dropout so the net tolerates it).
    """
    squeeze = rgb.ndim == 3
    if squeeze:
        rgb = rgb[None]
        normals = None if normals is None else normals[None]
        depth = None if depth is None else depth[None]
    n, h, w, _ = rgb.shape
    guides = params["conv_in"]["w"].shape[2] == _GUIDE_CH
    x = rgb
    if guides:
        nrm = (jnp.zeros((n, h, w, 3), rgb.dtype) if normals is None
               else normals)
        if depth is None:
            dep = jnp.zeros((n, h, w, 1), rgb.dtype)
        else:
            dep = depth if depth.ndim == 4 else depth[..., None]
            # compress depth to a bounded guide (silhouette edges matter,
            # absolute scale does not)
            dep = dep / (1.0 + jnp.abs(dep))
        x = jnp.concatenate([rgb, nrm, dep], axis=-1)

    y = jax.nn.relu(_conv(x, params["conv_in"]))
    for i in range(2):
        r = jax.nn.relu(_conv(y, params[f"res{i}_a"]))
        y = y + _conv(r, params[f"res{i}_b"])
        y = jax.nn.relu(y)
    res = _conv(y, params["conv_out"])
    out = jnp.clip(rgb + res, 0.0, 1.0)
    return out[0] if squeeze else out


_cached = None


def load_params(path: str = WEIGHTS_PATH):
    """Load committed weights; None when the artifact is absent."""
    global _cached
    if _cached is not None:
        return _cached
    if not os.path.exists(path):
        return None
    raw = np.load(path)
    params = {}
    for k in raw.files:
        layer, leaf = k.rsplit("/", 1)
        params.setdefault(layer, {})[leaf] = jnp.asarray(raw[k])
    _cached = params
    return params


def save_params(params, path: str = WEIGHTS_PATH):
    flat = {}
    for layer, leaves in params.items():
        for leaf, v in leaves.items():
            flat[f"{layer}/{leaf}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def denoise_frame(rgb, normals=None, depth=None):
    """CNN denoise with graceful à-trous fallback (no weights file)."""
    params = load_params()
    if params is None:
        from .denoise import atrous_denoise
        return atrous_denoise(rgb, normals=normals, depth=depth)
    return apply_cnn(params, rgb, normals=normals, depth=depth)

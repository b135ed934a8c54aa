"""LPIPS perceptual metric (VGG16 trunk + linear heads) in pure JAX.

Reference parity: thirdparty/lpipsPyTorch (used by threedgrut/render.py
for the lpips column of metrics.json) - a VGG16 feature extractor whose
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 activations are channel-unit-
normalized, squared-differenced, passed through non-negative 1x1 linear
heads and spatially averaged.

This environment has no network egress and ships no VGG weights, so the
metric is weight-gated exactly like the reference treats its optional
deps: `load_weights()` accepts the standard torch state dicts
(torchvision `vgg16` features + the `lpips` package's `vgg.pth` linear
heads, or the combined dict the lpips package serializes) and converts
them to JAX arrays; `available()` reports whether weights were found
($LPIPS_WEIGHTS / ~/.cache/threedgrut_tpu/). Evaluation code reports
lpips=None when unavailable.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per block; maxpool between
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
# activations tapped after the last relu of each block (relu{b}_{n})
_HEAD_CHANNELS = (64, 128, 256, 512, 512)

# ImageNet normalization used by lpipsPyTorch (modules/utils.py):
# input in [-1, 1], shifted/scaled
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    """3x3 same conv, NCHW; w [O,I,3,3], b [O]."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def vgg16_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray):
    """x [N,3,H,W] normalized; returns the 5 tapped activations."""
    taps = []
    i = 0
    for bi, (ch, n_convs) in enumerate(_VGG_BLOCKS):
        for ci in range(n_convs):
            x = jax.nn.relu(_conv(x, params[f"conv{i}_w"],
                                  params[f"conv{i}_b"]))
            i += 1
        taps.append(x)
        if bi < len(_VGG_BLOCKS) - 1:
            x = _maxpool(x)
    return taps


def lpips(params: Dict[str, jnp.ndarray], img0: jnp.ndarray,
          img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between two [N,3,H,W] images in [0, 1]."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def norm_input(im):
        return (im * 2.0 - 1.0 - shift) / scale

    f0 = vgg16_features(params, norm_input(img0))
    f1 = vgg16_features(params, norm_input(img1))
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        a = a * jax.lax.rsqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        b = b * jax.lax.rsqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2                                 # [N,C,H,W]
        w = params[f"lin{k}_w"]                          # [C]
        total = total + jnp.mean(
            jnp.sum(d * w[None, :, None, None], axis=1), axis=(1, 2))
    return jnp.mean(total)


# --------------------------------------------------------------------------
# weight loading / conversion
# --------------------------------------------------------------------------

def _default_weight_paths():
    env = os.environ.get("LPIPS_WEIGHTS")
    cands = [env] if env else []
    cands += [
        os.path.expanduser("~/.cache/threedgrut_tpu/lpips_vgg16.npz"),
        os.path.expanduser("~/.cache/threedgrut_tpu/lpips_vgg16.pth"),
    ]
    return [c for c in cands if c]


def available() -> bool:
    return any(os.path.exists(p) for p in _default_weight_paths())


def convert_torch_state(vgg_state: dict, lin_state: dict) -> Dict[str, np.ndarray]:
    """torchvision vgg16 `features.*` + lpips `lin*.model.1.weight` ->
    flat param dict (conv{i}_w/b, lin{k}_w)."""
    params = {}
    conv_idx = 0
    layer = 0
    for ch, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            w = vgg_state.get(f"features.{layer}.weight",
                              vgg_state.get(f"slice.{layer}.weight"))
            b = vgg_state.get(f"features.{layer}.bias",
                              vgg_state.get(f"slice.{layer}.bias"))
            if w is None:
                raise KeyError(f"missing vgg16 conv weight at layer {layer}")
            params[f"conv{conv_idx}_w"] = np.asarray(w, np.float32)
            params[f"conv{conv_idx}_b"] = np.asarray(b, np.float32)
            conv_idx += 1
            layer += 2  # conv + relu
        layer += 1      # maxpool
    for k in range(5):
        w = lin_state.get(f"lin{k}.model.1.weight",
                          lin_state.get(f"lins.{k}.model.1.weight"))
        if w is None:
            raise KeyError(f"missing lpips linear head lin{k}")
        params[f"lin{k}_w"] = np.maximum(
            np.asarray(w, np.float32).reshape(-1), 0.0)
    return params


def load_weights(path: Optional[str] = None) -> Optional[Dict[str, jnp.ndarray]]:
    """Load LPIPS params from an .npz (our layout) or .pth (torch dicts
    {'vgg': vgg_state, 'lin': lin_state} or a flat combined dict).
    Returns None when no weights are found."""
    paths = [path] if path else _default_weight_paths()
    for p in paths:
        if not p or not os.path.exists(p):
            continue
        if p.endswith(".npz"):
            data = np.load(p)
            return {k: jnp.asarray(data[k]) for k in data.files}
        import torch
        state = torch.load(p, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "vgg" in state and "lin" in state:
            params = convert_torch_state(
                {k: v.numpy() for k, v in state["vgg"].items()},
                {k: v.numpy() for k, v in state["lin"].items()})
        else:
            flat = {k: v.numpy() if hasattr(v, "numpy") else v
                    for k, v in state.items()}
            params = convert_torch_state(flat, flat)
        return {k: jnp.asarray(v) for k, v in params.items()}
    return None


def random_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """He-initialized params (architecture tests only - NOT a trained
    perceptual metric)."""
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    i = 0
    for ch, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            fan_in = in_ch * 9
            params[f"conv{i}_w"] = jnp.asarray(
                rng.normal(0, np.sqrt(2.0 / fan_in),
                           (ch, in_ch, 3, 3)).astype(np.float32))
            params[f"conv{i}_b"] = jnp.zeros((ch,), jnp.float32)
            in_ch = ch
            i += 1
    for k, ch in enumerate(_HEAD_CHANNELS):
        params[f"lin{k}_w"] = jnp.asarray(
            rng.uniform(0, 0.1, ch).astype(np.float32))
    return params

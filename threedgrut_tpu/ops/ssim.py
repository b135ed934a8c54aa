"""Windowed SSIM (pure JAX), matching fused-ssim semantics.

The reference uses the external ``fused_ssim`` CUDA package with
``padding="valid"`` (threedgrut/model/losses.py:31-33): 11x11 Gaussian
window, sigma 1.5, C1=0.01^2, C2=0.03^2, mean over the valid region.
Implemented here as two separable depthwise convolutions - XLA fuses the
elementwise SSIM map; no custom kernel needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01 ** 2
C2 = 0.03 ** 2


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return tuple(g.astype(np.float32))


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, size: int, sigma: float = 1.5):
    """[n, n-size+1] banded Gaussian operator: (x^T B)[j] = sum_k g_k
    x[j+k]. Dense on purpose: an 800x790 matmul rides the MXU and beats
    TPU depthwise convs by ~5x for the 11-tap SSIM window."""
    g = _gaussian_window(size, sigma)
    m = np.zeros((n, n - size + 1), np.float32)
    for k in range(size):
        m[np.arange(n - size + 1) + k, np.arange(n - size + 1)] += g[k]
    return m


def _blur(img, size: int):
    """Separable valid-padding Gaussian blur. img: [B, C, H, W].

    precision="high" (bf16x3 passes) keeps ~1e-6 relative error on the
    moment maps - far below the C1/C2 stabilizers - at half the MXU cost
    of "highest" (bf16x6).
    """
    h, w = img.shape[-2:]
    bh = jnp.asarray(_band_matrix(h, size))          # [H, H']
    bw = jnp.asarray(_band_matrix(w, size))          # [W, W']
    out = jnp.einsum("bchw,hk->bckw", img, bh, precision="high")
    return jnp.einsum("bckw,wl->bckl", out, bw, precision="high")


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """Per-window SSIM over the valid region. Inputs: [B, C, H, W] in
    [0,1]; returns [B, C, H-ws+1, W-ws+1]."""
    c = img1.shape[1]
    # one batched depthwise conv over all five moment maps (5x fewer conv
    # dispatches than blurring each map separately)
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=1)
    blurred = _blur(stacked, window_size)
    mu1, mu2, m11, m22, m12 = (blurred[:, i * c:(i + 1) * c]
                               for i in range(5))
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu12
    num = (2.0 * mu12 + C1) * (2.0 * sigma12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    return num / den


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """Mean SSIM over the valid region. Inputs: [B, C, H, W] in [0,1]."""
    return jnp.mean(ssim_map(img1, img2, window_size))


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0):
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

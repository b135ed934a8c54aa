"""Per-image affine color correction for cc-metrics.

Reference: threedgrut/utils/color_correct.py:96 (color_correct_affine) -
fit an affine transform (3x3 matrix + offset per image) from prediction to
ground truth by least squares and apply it, for the color-corrected
PSNR/SSIM variants reported by render.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def color_correct_affine(pred: jnp.ndarray, gt: jnp.ndarray,
                         clip: bool = True) -> jnp.ndarray:
    """pred/gt: [..., 3] in [0,1]. Returns affine-corrected prediction."""
    p = pred.reshape(-1, 3)
    g = gt.reshape(-1, 3)
    ones = jnp.ones((p.shape[0], 1), p.dtype)
    a = jnp.concatenate([p, ones], axis=1)              # [N, 4]
    # least squares: a @ w = g  ->  w = (a^T a)^-1 a^T g
    ata = a.T @ a + 1e-6 * jnp.eye(4, dtype=p.dtype)
    atg = a.T @ g
    w = jnp.linalg.solve(ata, atg)                       # [4, 3]
    out = (a @ w).reshape(pred.shape)
    return jnp.clip(out, 0.0, 1.0) if clip else out

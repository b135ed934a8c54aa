"""Real spherical-harmonics radiance evaluation, degrees 0..3.

Constants and basis ordering match the reference CUDA implementation
(threedgut_tracer .../models/gaussianParticles.cuh:61-100) so that SH
coefficient tensors are interchangeable with reference checkpoints/PLY.
The final radiance is ``eval + 0.5``, clamped at 0 (when requested).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate the SH basis for unit directions.

    Args:
        dirs: [..., 3] unit view directions.
        degree: max SH degree (static python int), 0..3.

    Returns:
        [..., (degree+1)**2] basis values with the reference's ordering and
        sign conventions (gaussianParticles.cuh:68-100).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    comps = [SH_C0 * one]
    if degree >= 1:
        comps += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        comps += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)


def eval_sh_radiance(coeffs: jnp.ndarray, dirs: jnp.ndarray, degree: int,
                     clamped: bool = True) -> jnp.ndarray:
    """Radiance from SH coefficients.

    Args:
        coeffs: [..., K, 3] per-particle SH coefficients, K >= (degree+1)**2.
        dirs: [..., 3] unit view directions (broadcastable to coeffs[...,:]).
        degree: active SH degree (static int).
        clamped: clamp negative radiance at 0 (reference default).

    Returns:
        [..., 3] RGB radiance (= basis . coeffs + 0.5).
    """
    basis = sh_basis(dirs, degree)  # [..., B]
    nb = basis.shape[-1]
    rad = jnp.einsum("...k,...kc->...c", basis, coeffs[..., :nb, :], precision="highest") + 0.5
    if clamped:
        rad = jnp.maximum(rad, 0.0)
    return rad


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] -> 0th SH coefficient (threedgrut/utils/render.py:46)."""
    return (rgb - 0.5) / SH_C0


def sh0_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """0th SH coefficient -> RGB (threedgrut/utils/render.py:52)."""
    return sh * SH_C0 + 0.5

"""Quaternion and small linear-algebra primitives (pure JAX).

Conventions follow the reference implementation:
- quaternions are (w, x, y, z), generally unnormalized as stored parameters
  and normalized on use (reference: threedgrut/utils/misc.py:67,
  threedgut_tracer .../models/gaussianParticles.cuh:39-59).
- ``quat_to_rotmat`` returns the standard active rotation R (local->world
  column frame); the canonical-frame transform used by the particle hit
  model is ``R^T @ (x - pos)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions along the last axis."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(norm, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z), assumed normalized -> [..., 3, 3] rotation.

    Matches threedgrut/utils/misc.py:67 (quaternion_to_so3).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray,
               eps: float = 1e-7) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions (w,x,y,z).

    Used for rolling-shutter pose interpolation
    (reference: threedgut_tracer .../sensors/sensors.h:54, tcnn::slerp).
    Falls back to lerp for nearly-parallel quaternions.
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    # take the short path
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < eps
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) < jnp.ndim(dot) else t
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return quat_normalize(out)


def safe_normalize(v: jnp.ndarray, eps: float = 1e-32) -> jnp.ndarray:
    """Normalize the last axis, guarding against zero vectors."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax_rsqrt(jnp.maximum(sq, eps))


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.rsqrt(x)

"""Ray <-> Gaussian-particle hit model (pure JAX, fully differentiable).

This is the 3D "max response along the ray" particle model shared by both
the 3DGRT tracer and the 3DGUT rasterizer in the reference:

1. transform the ray into the particle's canonical (unit-scale) frame,
2. squared perpendicular distance of the canonical ray to the origin,
3. generalized-Gaussian response of that distance,
4. alpha = min(max_alpha, density * response), gated by acceptance
   thresholds,
5. hitT = distance (in world units) from ray origin to the point of
   maximal response.

Reference math: threedgut_tracer .../models/gaussianParticles.cuh:267-348
(particleResponse), :350-422 (processHitFwd) and the Slang twin
threedgut_tracer .../kernels/slang/models/gaussianParticles.slang:96-243.
JAX autodiff replaces the hand-written CUDA/Slang backward passes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .quaternion import quat_normalize, quat_to_rotmat, safe_normalize

# Generalized-Gaussian scale factors: s = -4.5 / 3**n
# (gaussianParticles.cuh:267-308). Degree 0 is the linear kernel.
_GG_SCALE = {
    1: -1.5,
    2: -0.5,
    3: -0.166666666667,
    4: -0.0555555555556,
    5: -0.0185185185185,
    8: -0.000685871056241,
}
_LINEAR_SCALE = -0.329630334487


def particle_response(sq_dist: jnp.ndarray, kernel_degree: int) -> jnp.ndarray:
    """Generalized-Gaussian kernel response of squared canonical distance.

    ``kernel_degree`` is a static int in {0,1,2,3,4,5,8}; degree 2 is the
    classic Gaussian ``exp(-0.5 d^2)`` used by 3DGUT, degree 4 by 3DGRT.
    """
    d = sq_dist
    if kernel_degree == 0:
        return jnp.maximum(1.0 + _LINEAR_SCALE * jnp.sqrt(d), 0.0)
    s = _GG_SCALE[kernel_degree]
    if kernel_degree == 1:
        return jnp.exp(s * jnp.sqrt(d))
    if kernel_degree == 2:
        return jnp.exp(s * d)
    if kernel_degree == 3:
        return jnp.exp(s * d * jnp.sqrt(d))
    if kernel_degree == 4:
        return jnp.exp(s * d * d)
    if kernel_degree == 5:
        return jnp.exp(s * d * d * jnp.sqrt(d))
    if kernel_degree == 8:
        dd = d * d
        return jnp.exp(s * dd * dd)
    raise ValueError(f"unsupported kernel degree {kernel_degree}")


def particle_response_dsq(sq_dist: jnp.ndarray, response: jnp.ndarray,
                          kernel_degree: int) -> jnp.ndarray:
    """d(particle_response)/d(sq_dist) given the forward response.

    Used by the hand-derived raster backward (ops/pallas/raster.py fast
    path) to avoid replaying the forward inside ``jax.vjp``.
    """
    d = sq_dist
    if kernel_degree == 0:
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(d, 1e-18))
        return jnp.where(response > 0.0, 0.5 * _LINEAR_SCALE * inv_sqrt, 0.0)
    s = _GG_SCALE[kernel_degree]
    if kernel_degree == 1:
        return response * s * 0.5 * jax.lax.rsqrt(jnp.maximum(d, 1e-18))
    if kernel_degree == 2:
        return response * s
    if kernel_degree == 3:
        return response * s * 1.5 * jnp.sqrt(d)
    if kernel_degree == 4:
        return response * s * 2.0 * d
    if kernel_degree == 5:
        return response * s * 2.5 * d * jnp.sqrt(d)
    if kernel_degree == 8:
        return response * s * 4.0 * d * d * d
    raise ValueError(f"unsupported kernel degree {kernel_degree}")


class HitResult(NamedTuple):
    alpha: jnp.ndarray      # compositing alpha (0 where hit rejected)
    hit_t: jnp.ndarray      # world-space distance of max response
    accept: jnp.ndarray     # bool acceptance mask
    canonical: jnp.ndarray  # [..., 3] canonical-frame intersection (NHT)


def canonical_ray(ray_o: jnp.ndarray, ray_d: jnp.ndarray, pos: jnp.ndarray,
                  quat: jnp.ndarray, scale: jnp.ndarray):
    """Transform a world ray into the particle's canonical frame.

    Returns (gro, grd): canonical origin, normalized canonical direction.
    Reference: gaussianParticles.cuh:377-383.
    """
    rot = quat_to_rotmat(quat_normalize(quat))  # [...,3,3] local->world
    delta = ray_o - pos
    # world->local: R^T @ v
    gposcr = jnp.einsum("...ij,...i->...j", rot, delta, precision="highest")
    ray_d_r = jnp.einsum("...ij,...i->...j", rot, ray_d, precision="highest")
    inv_scale = 1.0 / scale
    gro = inv_scale * gposcr
    grdu = inv_scale * ray_d_r
    grd = safe_normalize(grdu)
    return gro, grd


def density_hit(ray_o: jnp.ndarray,
                ray_d: jnp.ndarray,
                pos: jnp.ndarray,
                quat: jnp.ndarray,
                scale: jnp.ndarray,
                density: jnp.ndarray,
                *,
                kernel_degree: int = 2,
                min_response: float = 0.0113,
                min_alpha: float = 1.0 / 255.0,
                max_alpha: float = 0.99) -> HitResult:
    """Alpha + hit distance of a ray against one Gaussian particle.

    All leading dims broadcast. ``density`` is the post-activation opacity.
    Matches gaussianParticles.slang:206-243 (particleDensityHit).
    """
    gro, grd = canonical_ray(ray_o, ray_d, pos, quat, scale)
    gcrod = jnp.cross(grd, gro)
    sq_dist = jnp.sum(gcrod * gcrod, axis=-1)
    response = particle_response(sq_dist, kernel_degree)
    alpha = jnp.minimum(max_alpha, response * density)
    accept = (response > min_response) & (alpha > min_alpha)

    # distance along the world ray to the max-response point
    proj = jnp.sum(grd * (-gro), axis=-1)
    grds = scale * grd * proj[..., None]
    hit_t = jnp.sqrt(jnp.maximum(jnp.sum(grds * grds, axis=-1), 1e-18))
    # keep reference sign semantics: negative when behind the origin
    hit_t = jnp.where(proj < 0.0, -hit_t, hit_t)

    canonical = gro + grd * proj[..., None]
    alpha = jnp.where(accept, alpha, 0.0)
    return HitResult(alpha=alpha, hit_t=hit_t, accept=accept,
                     canonical=canonical)


def hit_normal(ray_o, ray_d, pos, quat, scale):
    """Per-hit world normal, reference semantics.

    The reference blends, per accepted hit, the normalized elementwise
    product of the ray's 3-sigma-ellipsoid entry point (canonical frame)
    with the rotated scale vector R @ s
    (gaussianParticles.cuh:397-401, ellispoidSqRadius = 9).
    """
    rot = quat_to_rotmat(quat_normalize(quat))
    gro, grd = canonical_ray(ray_o, ray_d, pos, quat, scale)
    gcrod = jnp.cross(grd, gro)
    sq_dist = jnp.sum(gcrod * gcrod, axis=-1, keepdims=True)
    proj = jnp.sum(grd * (-gro), axis=-1, keepdims=True)
    entry = gro + grd * (proj - jnp.sqrt(jnp.maximum(9.0 - sq_dist, 0.0)))
    rs = jnp.einsum("...ji,...i->...j", rot, scale, precision="highest")
    n = entry * rs
    inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True),
                                    1e-24))
    return n * inv


def max_response_hit_distance(ray_o, ray_d, pos, quat, scale):
    """Signed distance of max response only (used by 3DGRT ordering).

    Reference: gaussianParticles.cuh:424-464 (intersectCustomParticle).
    """
    gro, grd = canonical_ray(ray_o, ray_d, pos, quat, scale)
    proj = jnp.sum(grd * (-gro), axis=-1)
    grds = scale * grd * proj[..., None]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(grds * grds, axis=-1), 1e-18))
    return jnp.where(proj < 0.0, -dist, dist)


def integrate_hits_scan(alphas: jnp.ndarray, hit_ts: jnp.ndarray,
                        features: jnp.ndarray, min_transmittance: float):
    """Front-to-back alpha compositing over a depth-ordered hit axis.

    Args:
        alphas: [M, ...] per-hit alpha (0 for rejected hits), ordered
            front-to-back along axis 0.
        hit_ts: [M, ...] per-hit distances.
        features: [M, ..., F] per-hit features.
        min_transmittance: early-out threshold; once transmittance falls
            below it remaining hits contribute nothing (hard stop, matches
            reference ray.kill() semantics in gutKBufferRenderer.cuh:223).

    Returns:
        (features [..., F], alpha [...], depth [...], hit_count [...]).
    """

    def body(carry, xs):
        transmittance, feat_acc, depth_acc, hits = carry
        a, t, f = xs
        alive = transmittance >= min_transmittance
        a = jnp.where(alive, a, 0.0)
        w = a * transmittance
        feat_acc = feat_acc + w[..., None] * f
        depth_acc = depth_acc + w * t
        hits = hits + (w > 0.0).astype(jnp.int32)
        transmittance = transmittance * (1.0 - a)
        return (transmittance, feat_acc, depth_acc, hits), None

    shape = alphas.shape[1:]
    init = (jnp.ones(shape, alphas.dtype),
            jnp.zeros(shape + (features.shape[-1],), features.dtype),
            jnp.zeros(shape, alphas.dtype),
            jnp.zeros(shape, jnp.int32))
    (transmittance, feat, depth, hits), _ = jax.lax.scan(
        body, init, (alphas, hit_ts, features))
    return feat, 1.0 - transmittance, depth, hits

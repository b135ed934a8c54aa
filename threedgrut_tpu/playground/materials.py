"""Batched Cook-Torrance microfacet BRDF sampling for the playground.

Semantics parity with the reference's stochastic path-tracer material
kernel (threedgrut_playground/include/playground/kernels/cuda/
materials.cuh:248 sampled_microfacet_brdf): a per-ray uniform draw
splits each bounce into transmissive / diffuse / specular lobes, each
importance-sampled from the GGX distribution, with Schlick Fresnel and
Smith geometry terms; the returned factor multiplies the path
throughput. TPU reformulation: all three lobes are evaluated for every
ray in one vectorized pass and the stochastic choice selects among them
(the lobes share most subexpressions, so this costs far less than 3x),
instead of the reference's per-thread branch.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-4


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _pdot(a, b):
    return jnp.maximum(_dot(a, b), 0.0)


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def normal_space(normal, local_dir):
    """Rotate a tangent-space direction (z-up) into the frame of
    ``normal`` (materials.cuh:124 compute_normal_space)."""
    nx, ny, nz = normal[..., 0:1], normal[..., 1:2], normal[..., 2:3]
    use_xy = jnp.abs(nx) > jnp.abs(ny)
    t = jnp.where(use_xy,
                  jnp.concatenate([-ny, nx, jnp.zeros_like(nx)], axis=-1),
                  jnp.concatenate([jnp.zeros_like(nx), -nz, ny], axis=-1))
    t = _normalize(t)
    b = jnp.cross(normal, t)
    return (local_dir[..., 0:1] * t + local_dir[..., 1:2] * b
            + local_dir[..., 2:3] * normal)


def sample_diffuse_ggx(normal, u_theta, u_phi):
    """Cosine-weighted hemisphere sample about ``normal``."""
    phi = 2.0 * jnp.pi * u_phi
    cos_t = jnp.sqrt(jnp.clip(1.0 - u_theta, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.clip(u_theta, 0.0, 1.0))
    local = jnp.concatenate([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                             cos_t], axis=-1)
    return normal_space(normal, local)


def sample_specular_ggx(normal, u_theta, u_phi, roughness):
    """GGX-distributed half-vector sample about ``normal``."""
    a = (roughness * roughness)
    phi = 2.0 * jnp.pi * u_phi
    cos2 = (1.0 - u_theta) / jnp.maximum(1.0 + (a * a - 1.0) * u_theta,
                                         _EPS)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos2, 0.0, 1.0))
    local = jnp.concatenate([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                             cos_t], axis=-1)
    return normal_space(normal, local)


def ggx_distribution(h, normal, roughness):
    """Trowbridge-Reitz normal distribution (materials.cuh:196)."""
    alpha = roughness * roughness
    a2 = alpha * alpha
    ndh = _pdot(normal, h)
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom * denom, _EPS)


def _geometry_schlick(ndv, roughness):
    k = 0.5 * roughness * roughness
    return ndv / jnp.maximum(ndv * (1.0 - k) + k, _EPS)


def geometry_smith(ndo, ndi, roughness):
    return _geometry_schlick(ndo, roughness) * _geometry_schlick(
        ndi, roughness)


def fresnel_schlick(cosine, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cosine, 0.0, 1.0), 5.0)


def refract(wi, normal, eta):
    """Snell refraction of incident direction ``wi`` (pointing toward
    the surface is NOT assumed — matches materials.cuh:227 pbr_refract
    operating on -wo). Returns 0 on total internal reflection."""
    ndw = _dot(normal, wi)
    k = 1.0 - eta * eta * (1.0 - ndw * ndw)
    refr = eta * wi - (eta * ndw + jnp.sqrt(jnp.maximum(k, 0.0))) * normal
    return jnp.where(k < 0.0, jnp.zeros_like(refr), refr)


def sample_microfacet_brdf(wo, normal, base_color, metallic, roughness,
                           transmission, ior, rand3):
    """One stochastic microfacet-BRDF bounce for a batch of rays.

    Args:
        wo: [R, 3] unit direction from the hit point toward the viewer.
        normal: [R, 3] shading normals (unit).
        base_color / metallic / roughness / transmission / ior: [R, k]
            per-ray material parameters (k = 3 or 1).
        rand3: [R, 3] uniforms in [0, 1): (phi, theta, lobe choice).
    Returns:
        (next_dir [R, 3], factor [R, 3]) — the scattered direction and
        the throughput multiplier (includes the x2 lobe-split
        compensation, materials.cuh:343).
    """
    u_phi = rand3[:, 0:1]
    u_theta = rand3[:, 1:2]
    p = rand3[:, 2:3]

    fresnel_reflect = 0.5
    f0 = jnp.full_like(base_color, 0.16 * fresnel_reflect * fresnel_reflect)
    f0 = f0 * (1.0 - metallic) + base_color * metallic

    # ---- transmissive lobe (GGX half-vector about the forward normal)
    front = _dot(wo, normal) >= 0.0
    fnormal = jnp.where(front, normal, -normal)
    eta = jnp.where(front, 1.0 / ior, ior)
    h_t = sample_specular_ggx(fnormal, u_theta, u_phi, roughness)
    l_trans = refract(-wo, h_t, eta)
    f_t = fresnel_schlick(_pdot(wo, h_t), f0)
    g_t = geometry_smith(_pdot(fnormal, wo), _pdot(-fnormal, l_trans),
                         roughness)
    factor_trans = (base_color * (1.0 - f_t) * g_t * _pdot(wo, h_t)
                    / jnp.maximum(_pdot(fnormal, h_t) * _pdot(fnormal, wo),
                                  1e-3))

    # ---- diffuse lobe (cosine hemisphere; energy = (1-F)(1-metal)*base)
    l_diff = sample_diffuse_ggx(normal, u_theta, u_phi)
    h_d = _normalize(wo + l_diff)
    f_d = fresnel_schlick(_pdot(wo, h_d), f0)
    factor_diff = (1.0 - f_d) * (1.0 - metallic) * base_color

    # ---- specular lobe (GGX half-vector reflect)
    h_s = sample_specular_ggx(normal, u_theta, u_phi, roughness)
    l_spec = -wo - 2.0 * _dot(h_s, -wo) * h_s
    f_s = fresnel_schlick(_pdot(wo, h_s), f0)
    g_s = geometry_smith(_pdot(normal, wo), _pdot(normal, l_spec),
                         roughness)
    factor_spec = (f_s * g_s * _pdot(wo, h_s)
                   / jnp.maximum(_pdot(normal, h_s) * _pdot(normal, wo),
                                 1e-3))

    # ---- stochastic lobe selection (reference split probabilities)
    choose_trans = (p < 0.5) & (2.0 * p < transmission)
    choose_diff = (p < 0.5) & ~choose_trans
    next_dir = jnp.where(choose_trans, l_trans,
                         jnp.where(choose_diff, l_diff, l_spec))
    factor = jnp.where(choose_trans, factor_trans,
                       jnp.where(choose_diff, factor_diff, factor_spec))
    next_dir = _normalize(next_dir)
    return next_dir, jnp.maximum(factor * 2.0, 0.0)

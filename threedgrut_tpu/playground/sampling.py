"""Anti-aliasing / SPP / depth-of-field sampling for the playground.

Parity targets (semantics, not code):
- threedgrut_playground/utils/spp.py:28 (SPP modes: none,
  independent_random, msaa, low_discrepancy_seq + progressive
  accumulation contract),
- threedgrut_playground/utils/antialiasing.py:40 (DirectX MSAA
  stratified patterns, Ray Tracing Gems II sample positions),
- threedgrut_playground/utils/rng.py (Burley 2019 shuffled scrambled
  Sobol, as adapted by InstantNGP),
- threedgrut_playground/utils/depth_of_field.py:27 (aperture sampling
  with Shirley's square-to-concentric-disc mapping).

TPU notes: everything is vectorized uint32 bit arithmetic in jnp —
Sobol direction vectors are generated procedurally from the standard
primitive-polynomial recurrence instead of a hardcoded table, and all
per-pixel sampling states ride a single [H, W] index grid (no Python
per-sample loops).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


def reverse_bits32(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(_U32)
    x = ((x & _u32(0xAAAAAAAA)) >> 1) | ((x & _u32(0x55555555)) << 1)
    x = ((x & _u32(0xCCCCCCCC)) >> 2) | ((x & _u32(0x33333333)) << 2)
    x = ((x & _u32(0xF0F0F0F0)) >> 4) | ((x & _u32(0x0F0F0F0F)) << 4)
    x = ((x & _u32(0xFF00FF00)) >> 8) | ((x & _u32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def laine_karras_permutation(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine-Karras 2011 hash-based owen-scramble pass (constants from
    Burley 2019, jcgt.org/published/0009/04/01)."""
    x = x.astype(_U32) + seed.astype(_U32)
    x = x ^ (x * _u32(0x6C50B47C))
    x = x ^ (x * _u32(0xB82F1E52))
    x = x ^ (x * _u32(0xC7AFE638))
    x = x ^ (x * _u32(0x8D22F6E6))
    return x


def owen_scramble(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Nested uniform scramble in base 2: bit-reverse, hash, reverse."""
    return reverse_bits32(laine_karras_permutation(reverse_bits32(x), seed))


def _sobol_directions() -> Tuple[np.ndarray, np.ndarray]:
    """Direction vectors for Sobol dims 0 and 1, generated from the
    standard recurrences (dim 0: van der Corput; dim 1: primitive
    polynomial x + 1, recurrence v_i = v_{i-1} ^ (v_{i-1} >> 1))."""
    v0 = np.array([1 << (31 - i) for i in range(32)], np.uint64)
    v1 = np.zeros(32, np.uint64)
    v1[0] = np.uint64(1) << np.uint64(31)
    for i in range(1, 32):
        v1[i] = v1[i - 1] ^ (v1[i - 1] >> np.uint64(1))
    return v0.astype(np.uint32), v1.astype(np.uint32)


_V0, _V1 = _sobol_directions()


def sobol2d(index: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First two Sobol dimensions at `index` (uint32)."""
    index = index.astype(_U32)
    v0 = jnp.asarray(_V0)
    v1 = jnp.asarray(_V1)
    x0 = jnp.zeros_like(index)
    x1 = jnp.zeros_like(index)
    for bit in range(32):
        mask = ((index >> bit) & _u32(1)).astype(_U32)
        x0 = x0 ^ mask * v0[bit]
        x1 = x1 ^ mask * v1[bit]
    return x0, x1


def _hash_combine(seed: jnp.ndarray, v: int) -> jnp.ndarray:
    seed = seed.astype(_U32)
    return seed ^ (_u32(v) + (seed << 6) + (seed >> 2))


def shuffled_scrambled_sobol2d(index, seed):
    """Burley 2019: owen-shuffle the index, owen-scramble each dim."""
    index = owen_scramble(_u32(index), _u32(seed))
    x0, x1 = sobol2d(index)
    x0 = owen_scramble(x0, _hash_combine(seed, 0))
    x1 = owen_scramble(x1, _hash_combine(seed, 1))
    return x0, x1


def ld_random_val_2d(index, seed):
    """Low-discrepancy 2D sample in [0, 1)^2."""
    s = np.float32(1.0 / (1 << 32))
    x0, x1 = shuffled_scrambled_sobol2d(index, seed)
    return x0.astype(jnp.float32) * s, x1.astype(jnp.float32) * s


def pcg3d(v: jnp.ndarray) -> jnp.ndarray:
    """PCG3D hash (Jarzynski & Olano 2020) — [..., 3] uint32 ->
    [..., 3] uint32; the playground kernel's per-ray RNG."""
    v = v.astype(_U32)
    v = v * _u32(1664525) + _u32(1013904223)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return jnp.stack([x, y, z], axis=-1)


def pcg3d_float(v: jnp.ndarray) -> jnp.ndarray:
    return pcg3d(v).astype(jnp.float32) * np.float32(1.0 / (1 << 32))


# DirectX MSAA subpixel sample positions (public, Ray Tracing Gems II) —
# the stratified patterns the reference's StratifiedRayJitter ships.
MSAA_PATTERNS = {
    1: [[0.500, 0.500]],
    2: [[0.250, 0.250], [0.750, 0.750]],
    4: [[0.375, 0.125], [0.875, 0.375], [0.625, 0.875], [0.125, 0.625]],
    8: [[0.5625, 0.6875], [0.4375, 0.3125], [0.8125, 0.4375],
        [0.3125, 0.8125], [0.1875, 0.1875], [0.0625, 0.5625],
        [0.6875, 0.0625], [0.9375, 0.9375]],
    16: [[0.5625, 0.4375], [0.4375, 0.6875], [0.3125, 0.3750],
         [0.7500, 0.5625], [0.1875, 0.6250], [0.6250, 0.1875],
         [0.1875, 0.3125], [0.6875, 0.8125], [0.3750, 0.1250],
         [0.5000, 0.9375], [0.2500, 0.8750], [0.1250, 0.2500],
         [0.0000, 0.5000], [0.9375, 0.7500], [0.8750, 0.0625],
         [0.0625, 0.0000]],
}

# max jitter radius that keeps a perturbed pattern stratified
_MSAA_RELAXATION = {1: 0.5, 2: 0.3535533905932738, 4: 0.2795084971874737,
                    8: 0.13975424859373686, 16: 0.04419417382415922}


class SPP:
    """Samples-per-pixel jitter source with progressive accumulation.

    Modes (utils/spp.py:28): ``none`` | ``independent_random`` |
    ``msaa`` | ``low_discrepancy_seq``. __call__ returns a [H, W, 2]
    jitter in [-0.5, 0.5] and advances the accumulation counter.
    """

    MODES = ("none", "independent_random", "msaa", "low_discrepancy_seq")

    def __init__(self, mode: str = "msaa", spp: int = 4,
                 batch_size: int = 1, seed: int = 0):
        mode = mode.lower()
        if mode not in self.MODES:
            raise ValueError(f"unknown spp mode {mode!r}")
        if mode == "msaa" and spp not in MSAA_PATTERNS:
            raise ValueError("msaa supports spp in (1, 2, 4, 8, 16)")
        self.mode = mode
        self.spp = spp
        self.batch_size = batch_size
        self.spp_accumulated_for_frame = 1
        self._key = jax.random.PRNGKey(seed)

    def reset_accumulation(self):
        self.spp_accumulated_for_frame = self.batch_size

    def has_more_to_accumulate(self) -> bool:
        return self.spp_accumulated_for_frame <= self.spp

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def __call__(self, img_h: int, img_w: int) -> jnp.ndarray:
        i = self.spp_accumulated_for_frame
        if self.mode == "none":
            jitter = jnp.zeros((img_h, img_w, 2), jnp.float32)
        elif self.mode == "independent_random":
            jitter = jax.random.uniform(self._next_key(),
                                        (img_h, img_w, 2)) - 0.5
        elif self.mode == "msaa":
            pat = jnp.asarray(MSAA_PATTERNS[self.spp], jnp.float32)
            base = pat[(i - 1) % self.spp]
            # perturb within the stratum to decorrelate pixels
            r = _MSAA_RELAXATION[self.spp]
            noise = (jax.random.uniform(self._next_key(),
                                        (img_h, img_w, 2)) - 0.5) * r
            jitter = 0.5 - (base[None, None] + noise)
        else:  # low_discrepancy_seq
            px = jnp.arange(img_w, dtype=_U32)[None, :]
            py = jnp.arange(img_h, dtype=_U32)[:, None]
            seed = (px * _u32(19349663) + py * _u32(96925573))
            seed = jnp.broadcast_to(seed, (img_h, img_w))
            index = jnp.full((img_h, img_w), i, _U32)
            x0, x1 = ld_random_val_2d(index, seed)
            jitter = jnp.stack([x0, x1], axis=-1) - 0.5
        self.spp_accumulated_for_frame += 1
        return jitter


def concentric_disc(u: jnp.ndarray, v: jnp.ndarray):
    """Shirley's square-to-concentric-disc map — [0,1)^2 -> unit disc
    (depth_of_field.py:56 pixel_to_disc_shirley)."""
    ox = 2.0 * u - 1.0
    oy = 2.0 * v - 1.0
    degenerate = (jnp.abs(ox) < 1e-12) & (jnp.abs(oy) < 1e-12)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(use_x,
                      (jnp.pi / 4.0) * (oy / jnp.where(use_x, ox, 1.0)),
                      (jnp.pi / 2.0)
                      - (jnp.pi / 4.0) * (ox / jnp.where(use_x, 1.0, oy)))
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    return (jnp.where(degenerate, 0.0, x), jnp.where(degenerate, 0.0, y))


class DepthOfField:
    """Thin-lens aperture sampler with progressive accumulation
    (depth_of_field.py:27): perturbs ray origins on a concentric-disc
    aperture in the camera's image plane and refocuses directions at
    the focus plane ``focus_z``."""

    def __init__(self, spp: int = 64, aperture_size: float = 0.1,
                 focus_z: float = 1.0, seed: int = 0):
        self.spp = spp
        self.aperture_size = aperture_size
        self.focus_z = focus_z
        self.spp_accumulated_for_frame = 1
        self._key = jax.random.PRNGKey(seed ^ 0x5EED)

    def reset_accumulation(self):
        self.spp_accumulated_for_frame = 1

    def has_more_to_accumulate(self) -> bool:
        return self.spp_accumulated_for_frame <= self.spp

    def __call__(self, cam_right: jnp.ndarray, cam_up: jnp.ndarray,
                 ray_o: jnp.ndarray, ray_d: jnp.ndarray):
        """Apply aperture jitter to flat ray batches [R, 3]."""
        r = ray_o.shape[0]
        i = self.spp_accumulated_for_frame
        self._key, k = jax.random.split(self._key)
        # low-discrepancy aperture samples: one shared LD pair per
        # accumulation index, decorrelated per ray by PCG3D
        idx = jnp.arange(r, dtype=_U32)
        h = pcg3d_float(jnp.stack(
            [idx, jnp.full((r,), i, _U32),
             jax.random.randint(k, (r,), 0, 1 << 30).astype(_U32)], axis=-1))
        dx, dy = concentric_disc(h[:, 0], h[:, 1])
        offset = (dx[:, None] * cam_right[None] +
                  dy[:, None] * cam_up[None]) * self.aperture_size
        focus_p = ray_o + ray_d * self.focus_z
        new_o = ray_o + offset
        new_d = focus_p - new_o
        new_d = new_d / jnp.maximum(
            jnp.linalg.norm(new_d, axis=-1, keepdims=True), 1e-12)
        self.spp_accumulated_for_frame += 1
        return new_o, new_d

"""Camera trajectories + video output for the playground.

Reference equivalents: threedgrut_playground/utils (video out, interpolated
camera trajectories). Uses imageio for encoding when available, falling
back to a PNG frame directory.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def interpolate_poses(poses_c2w: np.ndarray, n_frames: int) -> np.ndarray:
    """Smooth closed-loop fly-through through the given c2w poses
    (Catmull-Rom on positions, slerp on orientations)."""
    from ..export.transforms import _quat_multiply, _rotmat_to_quat

    n = len(poses_c2w)
    out = []
    for f in range(n_frames):
        t = f / n_frames * n
        i0 = int(np.floor(t)) % n
        i1 = (i0 + 1) % n
        a = t - np.floor(t)
        p = (1 - a) * poses_c2w[i0, :3, 3] + a * poses_c2w[i1, :3, 3]
        q0 = _rotmat_to_quat(poses_c2w[i0, :3, :3])
        q1 = _rotmat_to_quat(poses_c2w[i1, :3, :3])
        if np.dot(q0, q1) < 0:
            q1 = -q1
        dot = np.clip(np.dot(q0, q1), -1, 1)
        theta = np.arccos(dot)
        if theta < 1e-5:
            q = q0
        else:
            q = (np.sin((1 - a) * theta) * q0 + np.sin(a * theta) * q1) \
                / np.sin(theta)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = r
        m[:3, 3] = p
        out.append(m)
    return np.stack(out)


def write_video(frames: List[np.ndarray], path: str, fps: int = 30):
    """Encode uint8 RGB frames; falls back to PNG frames directory."""
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception:
        from PIL import Image

        d = os.path.splitext(path)[0] + "_frames"
        os.makedirs(d, exist_ok=True)
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(d, f"{i:05d}.png"))
        return d


def bilateral_denoise(img: np.ndarray, sigma_spatial: float = 2.0,
                      sigma_color: float = 0.1, radius: int = 3
                      ) -> np.ndarray:
    """Simple bilateral filter - the TPU-side stand-in for the reference's
    OptiX AI denoiser toggle (hybridTracer.cpp:503)."""
    import jax.numpy as jnp

    x = jnp.asarray(img, jnp.float32)
    h, w = x.shape[:2]
    acc = jnp.zeros_like(x)
    norm = jnp.zeros((h, w, 1), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(x, (dy, dx), axis=(0, 1))
            wsp = np.exp(-(dx * dx + dy * dy) / (2 * sigma_spatial ** 2))
            wcol = jnp.exp(-jnp.sum((shifted - x) ** 2, -1, keepdims=True)
                           / (2 * sigma_color ** 2))
            wgt = wsp * wcol
            acc = acc + shifted * wgt
            norm = norm + wgt
    return np.asarray(acc / norm)

"""Background models (threedgrut/model/background.py:29-120).

``background-color``: composite a solid color (black/white/random-at-train)
behind the rendered radiance: pred = features + bg * (1 - opacity)
(threedgrut/utils/render.py:95 apply_background).
``skip-background``: leave the radiance as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BackgroundConfig:
    name: str = struct.field(pytree_node=False, default="background-color")
    color: str = struct.field(pytree_node=False, default="black")


def background_color(cfg: BackgroundConfig, key=None, train: bool = False):
    """Per-call background RGB (or None for skip-background)."""
    if cfg.name == "skip-background":
        return None
    if cfg.color == "black":
        return jnp.zeros(3, jnp.float32)
    if cfg.color == "white":
        return jnp.ones(3, jnp.float32)
    if cfg.color == "random":
        if train and key is not None:
            return jax.random.uniform(key, (3,), jnp.float32)
        return jnp.full((3,), 0.5, jnp.float32)
    raise ValueError(f"unknown background color {cfg.color}")


def apply_background(pred_features, pred_opacity, bg_rgb):
    """threedgrut/utils/render.py:95."""
    if bg_rgb is None:
        return pred_features
    return pred_features + bg_rgb * (1.0 - pred_opacity)

"""Misc utilities mirroring threedgrut/utils/misc.py + render.py helpers."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def jet_map(values: jnp.ndarray, max_val: float) -> jnp.ndarray:
    """1-channel map [..., 1] -> jet-colormapped RGB [..., 3]
    (threedgrut/utils/misc.py:138)."""
    vs = jnp.clip(values / max_val, 0.0, 1.0)
    r = jnp.clip(4.0 * (vs - 0.375), 0, 1) * jnp.clip(-4.0 * (vs - 1.125), 0, 1)
    g = jnp.clip(4.0 * (vs - 0.125), 0, 1) * jnp.clip(-4.0 * (vs - 0.875), 0, 1)
    b = jnp.clip(4.0 * vs + 0.5, 0, 1) * jnp.clip(-4.0 * (vs - 0.625), 0, 1)
    return jnp.concatenate([r, g, b], axis=-1)


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    """IEC 61966-2-1 transfer (utils/post_processing_linear_to_srgb.py)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x,
                     1.055 * jnp.power(jnp.maximum(x, 1e-8), 1 / 2.4) - 0.055)


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power((x + 0.055) / 1.055, 2.4))


def sh_degree_to_specular_dim(degree: int) -> int:
    return 3 * ((degree + 1) ** 2 - 1)


def sh_degree_to_num_features(degree: int) -> int:
    return sh_degree_to_specular_dim(degree) + 3


def create_summary_writer(out_dir: str, use_wandb: bool = False,
                          wandb_project: str = "threedgrut_tpu"):
    """TensorBoard(+wandb) writer factory (utils/misc.py:151)."""
    writers = []
    try:
        from tensorboardX import SummaryWriter
        writers.append(SummaryWriter(out_dir))
    except ImportError:
        pass
    if use_wandb:
        try:
            import wandb
            wandb.init(project=wandb_project, dir=out_dir)
            writers.append(_WandbWriter(wandb))
        except ImportError:
            pass
    return MultiWriter(writers)


class _WandbWriter:
    def __init__(self, wandb):
        self._wandb = wandb

    def add_scalar(self, tag, value, step):
        self._wandb.log({tag: value}, step=step)

    def add_image(self, tag, img, step, dataformats="HWC"):
        self._wandb.log({tag: self._wandb.Image(np.asarray(img))}, step=step)

    def flush(self):
        pass


class MultiWriter:
    """Fan-out scalar/image writer; silently no-ops with no backends."""

    def __init__(self, writers):
        self.writers = writers

    def add_scalar(self, tag, value, step):
        for w in self.writers:
            w.add_scalar(tag, float(value), step)

    def add_image(self, tag, img, step):
        for w in self.writers:
            w.add_image(tag, np.asarray(img), step, dataformats="HWC")

    def flush(self):
        for w in self.writers:
            w.flush()

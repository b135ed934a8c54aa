"""Synthetic scene fixtures shared across renderer tests."""

import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                             GaussianParams, GaussianState)
from threedgrut_tpu.ops.cameras import make_pinhole
from threedgrut_tpu.ops.sh import rgb_to_sh0


def make_test_scene(n=128, capacity=None, seed=0, res=(64, 64), max_sh=3,
                    n_active=None, spread=1.2, z_range=(2.5, 6.0),
                    scale_range=(0.05, 0.25), density_range=(0.2, 0.95)):
    """Random Gaussians in front of a pinhole camera at the origin (+z)."""
    rng = np.random.default_rng(seed)
    cap = capacity or n
    n_active = n if n_active is None else n_active

    pos = np.zeros((cap, 3), np.float32)
    pos[:, 2] = 100.0  # park inactive slots far away
    pos[:n, 0:2] = rng.uniform(-spread, spread, (n, 2))
    pos[:n, 2] = rng.uniform(*z_range, n)

    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)

    scales = rng.uniform(*scale_range, (cap, 3)).astype(np.float32)
    dens = rng.uniform(*density_range, (cap, 1)).astype(np.float32)

    albedo = np.asarray(rgb_to_sh0(
        jnp.asarray(rng.uniform(0.05, 0.95, (cap, 3)).astype(np.float32))))
    spec_dim = 3 * ((max_sh + 1) ** 2 - 1)
    spec = (rng.normal(size=(cap, spec_dim)) * 0.05).astype(np.float32)

    cfg = GaussianModelConfig(density_activation="none",
                              scale_activation="none",
                              max_sh_degree=max_sh)
    params = GaussianParams(
        positions=jnp.asarray(pos), rotation=jnp.asarray(quat),
        scale=jnp.asarray(scales), density=jnp.asarray(dens),
        features_albedo=jnp.asarray(albedo),
        features_specular=jnp.asarray(spec))
    model = GaussianState(params=params,
                          n_active=jnp.asarray(n_active, jnp.int32),
                          n_active_features=jnp.asarray(max_sh, jnp.int32),
                          config=cfg)

    w, h = res
    cam = make_pinhole(resolution=res, focal=(0.9 * w, 0.9 * w),
                       principal=(w / 2, h / 2))
    return cam, model

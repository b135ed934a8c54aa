"""Gaussian mixture model state: static-capacity parameter pytree.

TPU-native redesign of the reference ``MixtureOfGaussians``
(threedgrut/model/model.py:50): instead of reallocating parameter tensors
on densify/prune (strategy/base.py:77), parameters live in fixed-capacity
arrays with an ``n_active`` count; densification permutes/compacts within
capacity so every training step compiles once.

Raw (pre-activation) parameters:
    positions [C,3], rotation [C,4] (wxyz, unnormalized), scale [C,3]
    (log-scale by default), density [C,1] (logit by default),
    features_albedo [C,3] + features_specular [C,S] (SH mode) or
    features [C,K] (NHT mode).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.sh import num_sh_coeffs, rgb_to_sh0


def sh_degree_to_specular_dim(degree: int) -> int:
    """threedgrut/utils/misc.py:128."""
    return 3 * ((degree + 1) ** 2 - 1)


# --- activations (threedgrut/utils/misc.py:46-63) -------------------------

def _inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


ACTIVATIONS: Dict[str, Callable] = {
    "sigmoid": jax.nn.sigmoid,
    "exp": jnp.exp,
    "none": lambda x: x,
}
INVERSE_ACTIVATIONS: Dict[str, Callable] = {
    "sigmoid": _inverse_sigmoid,
    "exp": jnp.log,
    "none": lambda x: x,
}


@struct.dataclass
class GaussianParams:
    """Learnable raw parameters (optimized leaves)."""
    positions: jnp.ndarray
    rotation: jnp.ndarray
    scale: jnp.ndarray
    density: jnp.ndarray
    features_albedo: Optional[jnp.ndarray] = None
    features_specular: Optional[jnp.ndarray] = None
    features: Optional[jnp.ndarray] = None  # NHT mode

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]


@struct.dataclass
class GaussianModelConfig:
    """Static model configuration (mirrors configs/base_gs.yaml model block)."""
    density_activation: str = struct.field(pytree_node=False, default="sigmoid")
    scale_activation: str = struct.field(pytree_node=False, default="exp")
    feature_type: str = struct.field(pytree_node=False, default="sh")
    max_sh_degree: int = struct.field(pytree_node=False, default=3)
    nht_feature_dim: int = struct.field(pytree_node=False, default=48)
    default_density: float = struct.field(pytree_node=False, default=0.1)
    default_scale_factor: float = struct.field(pytree_node=False, default=1.0)


@struct.dataclass
class GaussianState:
    """Full mutable model state: params + capacity bookkeeping."""
    params: GaussianParams
    n_active: jnp.ndarray  # [] int32, number of live particles <= capacity
    n_active_features: jnp.ndarray  # [] int32, active SH degree (progressive)
    config: GaussianModelConfig = struct.field(pytree_node=False,
                                               default=GaussianModelConfig())

    # ---- derived, post-activation views ----
    @property
    def capacity(self) -> int:
        return self.params.capacity

    def active_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.n_active

    def get_scale(self) -> jnp.ndarray:
        return ACTIVATIONS[self.config.scale_activation](self.params.scale)

    def get_density(self) -> jnp.ndarray:
        return ACTIVATIONS[self.config.density_activation](self.params.density)

    def get_rotation(self) -> jnp.ndarray:
        norm = jnp.linalg.norm(self.params.rotation, axis=-1, keepdims=True)
        return self.params.rotation / jnp.maximum(norm, 1e-12)

    def get_features(self) -> jnp.ndarray:
        if self.config.feature_type == "sh":
            return jnp.concatenate(
                [self.params.features_albedo, self.params.features_specular],
                axis=1)
        return self.params.features

    def sh_coeffs(self) -> jnp.ndarray:
        """[C, K, 3] SH coefficients in the kernel layout.

        Storage layout matches the reference PLY/checkpoint convention:
        features_albedo = DC [C,3]; features_specular = [C, 3*(K-1)] laid
        out coefficient-major ([K-1, 3] per particle).
        """
        c = self.capacity
        k = num_sh_coeffs(self.config.max_sh_degree)
        dc = self.params.features_albedo[:, None, :]
        rest = self.params.features_specular.reshape(c, k - 1, 3)
        return jnp.concatenate([dc, rest], axis=1)


def inverse_scale_activation(cfg: GaussianModelConfig, x):
    return INVERSE_ACTIVATIONS[cfg.scale_activation](x)


def inverse_density_activation(cfg: GaussianModelConfig, x):
    return INVERSE_ACTIVATIONS[cfg.density_activation](x)


def default_capacity_for(n_points: int, headroom: float = 1.0) -> int:
    """Round capacity up to a TPU-friendly multiple of 256."""
    c = int(np.ceil(n_points * headroom / 256.0)) * 256
    return max(c, 256)


def initialize_from_points(cfg: GaussianModelConfig,
                           points: np.ndarray,
                           colors: Optional[np.ndarray] = None,
                           observer_scale: Optional[np.ndarray] = None,
                           capacity: Optional[int] = None,
                           seed: int = 42) -> GaussianState:
    """Default initialization from a point cloud.

    Mirrors threedgrut/model/model.py:708 (default_initialize_from_points):
    random rotations, scales from kNN / observer distances, constant default
    density, SH DC from colors.
    """
    n = points.shape[0]
    cap = capacity or default_capacity_for(n)
    rng = np.random.default_rng(seed)

    positions = np.zeros((cap, 3), np.float32)
    positions[:n] = points.astype(np.float32)

    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1.0
    rotation[:n] = rng.random((n, 4), dtype=np.float32)

    if observer_scale is None:
        observer_scale = _knn_mean_dist(points)
    observer_scale = np.maximum(observer_scale * cfg.default_scale_factor,
                                1e-7)
    scale = np.full((cap, 3), -10.0, np.float32)
    raw_scale = np.asarray(
        INVERSE_ACTIVATIONS[cfg.scale_activation](jnp.asarray(observer_scale)))
    scale[:n] = raw_scale[:, None].astype(np.float32)

    density = np.full(
        (cap, 1),
        float(INVERSE_ACTIVATIONS[cfg.density_activation](
            jnp.asarray(cfg.default_density))),
        np.float32)

    if colors is None:
        colors = rng.integers(0, 256, (n, 3)).astype(np.float32) / 255.0
    else:
        colors = colors.astype(np.float32)
        if colors.max() > 1.5:
            colors = colors / 255.0

    if cfg.feature_type == "sh":
        albedo = np.zeros((cap, 3), np.float32)
        albedo[:n] = np.asarray(rgb_to_sh0(jnp.asarray(colors)))
        spec = np.zeros((cap, sh_degree_to_specular_dim(cfg.max_sh_degree)),
                        np.float32)
        params = GaussianParams(
            positions=jnp.asarray(positions), rotation=jnp.asarray(rotation),
            scale=jnp.asarray(scale), density=jnp.asarray(density),
            features_albedo=jnp.asarray(albedo),
            features_specular=jnp.asarray(spec))
    else:
        feats = np.zeros((cap, cfg.nht_feature_dim), np.float32)
        half_pi = np.pi / 2
        feats[:n] = rng.uniform(-half_pi, half_pi,
                                (n, cfg.nht_feature_dim)).astype(np.float32)
        params = GaussianParams(
            positions=jnp.asarray(positions), rotation=jnp.asarray(rotation),
            scale=jnp.asarray(scale), density=jnp.asarray(density),
            features=jnp.asarray(feats))

    return GaussianState(params=params,
                         n_active=jnp.asarray(n, jnp.int32),
                         n_active_features=jnp.asarray(0, jnp.int32),
                         config=cfg)


def random_initialization(cfg: GaussianModelConfig, n: int,
                          extent: float = 1.0, seed: int = 42,
                          capacity: Optional[int] = None) -> GaussianState:
    """Uniform random init inside a cube (configs/initialization/random.yaml)."""
    rng = np.random.default_rng(seed)
    pts = (rng.random((n, 3)).astype(np.float32) * 2.0 - 1.0) * extent
    colors = rng.random((n, 3)).astype(np.float32)
    scale0 = np.full((n,), 0.02 * extent, np.float32)
    return initialize_from_points(cfg, pts, colors, observer_scale=scale0,
                                  capacity=capacity, seed=seed)


def state_from_checkpoint(path: str, cfg: Optional[GaussianModelConfig]
                          = None) -> GaussianState:
    """Build a GaussianState from a trainer .npz checkpoint
    (initialization/checkpoint.yaml; reference model.init_from_checkpoint
    model.py:613 - the model params only, not the optimizer state:
    `conf.resume` is the full-resume path, this is re-initialization)."""
    import jax.numpy as jnp
    data = np.load(path)
    get = lambda k: (jnp.asarray(data[f"params/{k}"])
                     if f"params/{k}" in data.files else None)
    params = GaussianParams(
        positions=get("positions"), rotation=get("rotation"),
        scale=get("scale"), density=get("density"),
        features_albedo=get("features_albedo"),
        features_specular=get("features_specular"),
        features=get("features"))
    degree = int(data["n_active_features"])
    cfg = cfg or GaussianModelConfig(max_sh_degree=max(degree, 0))
    return GaussianState(params=params,
                         n_active=jnp.asarray(data["n_active"]),
                         n_active_features=jnp.asarray(degree, jnp.int32),
                         config=cfg)


def _knn_mean_dist(points: np.ndarray, k: int = 4) -> np.ndarray:
    """sqrt(mean of squared distances to 3 nearest neighbors)
    (threedgrut/model/geometry.py k_nearest_neighbors usage, model.py:731)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=k)
    return np.sqrt((d[:, 1:] ** 2).mean(axis=1)).astype(np.float32)

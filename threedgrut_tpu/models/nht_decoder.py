"""NHT feature decoder: small MLP mapping rendered ray features -> RGB.

Reference: threedgrut/model/feature_decoder.py:21-222 (tiny-cuda-nn
NetworkWithInputEncoding). TPU equivalent: a plain flax MLP - three 128-
wide ReLU layers batch over all pixels as large MXU matmuls; the SH
direction encoding (degree 3) is evaluated in fp32 and concatenated with
the alpha-blended ray features. EMA shadow weights mirror
feature_decoder.py:106-141.

Input convention matches the reference: directions are mapped through
(v * sh_scale + 1) / 2 before the encoding (feature_decoder.py:200), and
the tcnn SphericalHarmonics encoding evaluates SH on the *remapped* unit
cube coordinates scaled to [-1, 1].
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.sh import sh_basis


class NHTDecoderMLP(nn.Module):
    """ReLU MLP: [features + dir encoding] -> RGB (sigmoid)."""
    hidden_dim: int = 128
    num_layers: int = 3
    output_activation: str = "Sigmoid"

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, use_bias=False,
                         dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
        x = nn.Dense(3, use_bias=False, dtype=jnp.bfloat16,
                     param_dtype=jnp.float32)(x)
        x = x.astype(jnp.float32)
        if self.output_activation == "Sigmoid":
            x = jax.nn.sigmoid(x)
        return x


class FeatureDecoder:
    """Stateful wrapper: params, EMA shadow, apply()."""

    def __init__(self, ray_feature_dim: int, hidden_dim: int = 128,
                 num_layers: int = 3, dir_encoding_degree: int = 3,
                 sh_scale: float = 3.0, output_activation: str = "Sigmoid",
                 ema_decay: float = 0.95, ema_start_step: int = 0,
                 seed: int = 0):
        self.ray_feature_dim = ray_feature_dim
        self.dir_encoding_degree = dir_encoding_degree
        self.sh_scale = sh_scale
        self.ema_decay = ema_decay
        self.ema_start_step = ema_start_step
        self.module = NHTDecoderMLP(hidden_dim=hidden_dim,
                                    num_layers=num_layers,
                                    output_activation=output_activation)
        enc_dim = dir_encoding_degree ** 2  # tcnn SH degree-D -> D^2 dims
        dummy = jnp.zeros((1, ray_feature_dim + enc_dim), jnp.float32)
        self.params = self.module.init(jax.random.PRNGKey(seed), dummy)
        self.ema_shadow = jax.tree.map(jnp.copy, self.params) \
            if ema_decay > 0 else None

    def encode_input(self, features, dirs):
        """features [..., F], dirs [..., 3] world unit -> MLP input."""
        # tcnn expects [0,1]-cube inputs: (v * sh_scale + 1) / 2 then the
        # encoding internally remaps to [-1, 1] -> net effect: SH evaluated
        # at v * sh_scale / ... keep the same composition
        cube = (dirs * self.sh_scale + 1.0) * 0.5
        remapped = cube * 2.0 - 1.0
        enc = sh_basis(remapped, self.dir_encoding_degree - 1)
        return jnp.concatenate([features, enc], axis=-1)

    def apply(self, params, features, dirs):
        return self.module.apply(params, self.encode_input(features, dirs))

    def __call__(self, features, dirs, use_ema: bool = False):
        params = self.ema_shadow if (use_ema and self.ema_shadow is not None
                                     ) else self.params
        return self.apply(params, features, dirs)

    def ema_update(self, global_step: int):
        """shadow <- decay * shadow + (1-decay) * params."""
        if self.ema_shadow is None or global_step < self.ema_start_step:
            return
        d = self.ema_decay
        self.ema_shadow = jax.tree.map(
            lambda s, p: d * s + (1.0 - d) * p, self.ema_shadow, self.params)

    def state_dict(self) -> Dict[str, np.ndarray]:
        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        out = {"/".join(str(k) for k in path): np.asarray(v)
               for path, v in flat}
        if self.ema_shadow is not None:
            flat_e = jax.tree_util.tree_flatten_with_path(self.ema_shadow)[0]
            out.update({"ema:" + "/".join(str(k) for k in path): np.asarray(v)
                        for path, v in flat_e})
        return out

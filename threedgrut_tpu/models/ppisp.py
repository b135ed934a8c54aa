"""Full-depth PPISP: learned per-(camera, frame) ISP + controller CNN.

Reference parity targets:
- the ISP transform chain of the runtime SPG shader
  (threedgrut/export/usd/post_processing/ppisp_spg/ppisp_usd_spg.cu:199
  applyPPISPColor): responsivity -> 2^exposure -> per-channel radial
  vignetting -> chromaticity homography from four 2D color latents ->
  per-channel parametric CRF (toe/shoulder/gamma/center),
- the controller CNN architecture contract
  (export/usd/post_processing/ppisp_controller_weights.py:84
  ControllerArchitectureSpec): three 1x1 convs (3 -> 16 -> 32 -> 64)
  with a stride-3 max-pool after the first, adaptive average pool to
  5x5, a 3-layer 128-wide ReLU MLP trunk over the flattened features
  plus a prior-exposure scalar, and two heads (exposure scalar + 8
  color-latent params),
- the trainer integration contract (threedgrut/trainer.py:462-526):
  per-frame exposure/color latents, per-camera responsivity/vignetting/
  CRF, controller distillation in the last n_distillation_steps.

Everything is plain differentiable jnp — the whole ISP rides inside the
jitted train step, and the controller is a flax module whose weights
flatten into the reference's export layout
(ppisp_controller_weights.py:318 flatten_controller_weights).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# fixed 2x2 whitening of the color latents (ppisp_usd_spg.cu:72-79);
# these are data constants of the format, not tunables
_LATENT_WHITEN = np.asarray([
    [[0.0480542, -0.0043631], [-0.0043631, 0.0481283]],   # blue
    [[0.0580570, -0.0179872], [-0.0179872, 0.0431061]],   # red
    [[0.0433336, -0.0180537], [-0.0180537, 0.0580500]],   # green
    [[0.0128369, -0.0034654], [-0.0034654, 0.0128158]],   # neutral
], np.float32)


def init_ppisp_params(n_cameras: int, n_frames: int,
                      exposure_prior: Optional[np.ndarray] = None) -> Dict:
    """Learnable ISP parameters, identity-initialized.

    Per-frame: exposure [F] (log2 offsets), color_latents [F, 8]
    (blue/red/green/neutral xy pairs; 0 = identity homography).
    Per-camera: responsivity [C], vig_center [C, 3, 2],
    vig_alpha [C, 3, 3] (r^2/r^4/r^6 coefficients), crf [C, 3, 4] (raw
    toe/shoulder/gamma/center; 0-init gives toe=shoulder~1.0,
    gamma~0.79, center=0.5 — the shader's neutral-ish start).
    """
    exp0 = np.zeros((n_frames,), np.float32)
    if exposure_prior is not None:
        exp0[:len(exposure_prior)] = np.asarray(exposure_prior, np.float32)
    return {
        "exposure": jnp.asarray(exp0),
        "color_latents": jnp.zeros((n_frames, 8), jnp.float32),
        "responsivity": jnp.zeros((n_cameras,), jnp.float32),  # log2 scale
        "vig_center": jnp.zeros((n_cameras, 3, 2), jnp.float32),
        "vig_alpha": jnp.zeros((n_cameras, 3, 3), jnp.float32),
        "crf": jnp.zeros((n_cameras, 3, 4), jnp.float32),
    }


def _bounded_softplus(raw, min_value):
    return min_value + jax.nn.softplus(raw)


def compute_homography(latents: jnp.ndarray) -> jnp.ndarray:
    """Chromaticity homography from the 8 color latents
    (ppisp_usd_spg.cu:69 computeHomography). latents: [..., 8] ordered
    (blue, red, green, neutral) xy pairs. Returns [..., 3, 3]."""
    lat = latents.reshape(latents.shape[:-1] + (4, 2))
    wh = jnp.asarray(_LATENT_WHITEN)
    d = jnp.einsum("kij,...kj->...ki", wh, lat)   # whitened deltas
    bd, rd, gd, nd = (d[..., 0, :], d[..., 1, :], d[..., 2, :],
                      d[..., 3, :])
    one = jnp.ones_like(bd[..., 0])
    t_b = jnp.stack([bd[..., 0], bd[..., 1], one], axis=-1)
    t_r = jnp.stack([1.0 + rd[..., 0], rd[..., 1], one], axis=-1)
    t_g = jnp.stack([gd[..., 0], 1.0 + gd[..., 1], one], axis=-1)
    t_n = jnp.stack([1.0 / 3.0 + nd[..., 0], 1.0 / 3.0 + nd[..., 1], one],
                    axis=-1)

    t = jnp.stack([t_b, t_r, t_g], axis=-1)       # columns = anchors
    skew = jnp.stack([
        jnp.stack([jnp.zeros_like(one), -t_n[..., 2], t_n[..., 1]],
                  axis=-1),
        jnp.stack([t_n[..., 2], jnp.zeros_like(one), -t_n[..., 0]],
                  axis=-1),
        jnp.stack([-t_n[..., 1], t_n[..., 0], jnp.zeros_like(one)],
                  axis=-1),
    ], axis=-2)
    m = skew @ t
    # null vector of m (t_n in the anchor basis); rows of m are
    # near-coplanar, pick the largest cross product for stability
    c01 = jnp.cross(m[..., 0, :], m[..., 1, :])
    c02 = jnp.cross(m[..., 0, :], m[..., 2, :])
    c12 = jnp.cross(m[..., 1, :], m[..., 2, :])
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    lam = jnp.where(n01 >= 1e-20, c01, jnp.where(n02 >= 1e-20, c02, c12))
    h = t * lam[..., None, :]                     # t @ diag(lam)
    sinv = jnp.asarray([[-1.0, -1.0, 1.0],
                        [1.0, 0.0, 0.0],
                        [0.0, 1.0, 0.0]], jnp.float32)
    h = h @ sinv
    s = h[..., 2:3, 2:3]
    h = jnp.where(jnp.abs(s) > 1e-20, h / jnp.where(
        jnp.abs(s) > 1e-20, s, 1.0), h)
    return h


def apply_crf(x: jnp.ndarray, crf_raw: jnp.ndarray) -> jnp.ndarray:
    """Parametric camera response (ppisp_usd_spg.cu:154 applyCRF).
    x: [..., 3] in [0, 1]; crf_raw: [3, 4] per-channel raw params."""
    x = jnp.clip(x, 0.0, 1.0)
    toe = _bounded_softplus(crf_raw[:, 0], 0.3)
    shoulder = _bounded_softplus(crf_raw[:, 1], 0.3)
    gamma = _bounded_softplus(crf_raw[:, 2], 0.1)
    eps = 1e-6
    center = jnp.clip(jax.nn.sigmoid(crf_raw[:, 3]), eps, 1.0 - eps)
    lerp = jnp.maximum((shoulder - toe) * center + toe, eps)
    a = shoulder * center / lerp
    b = 1.0 - a
    # x**toe with x clamped away from 0 for a finite gradient
    below = a * jnp.power(jnp.maximum(x / center, 1e-12), toe)
    above = 1.0 - b * jnp.power(
        jnp.maximum((1.0 - x) / (1.0 - center), 1e-12), shoulder)
    y = jnp.where(x <= center, below, above)
    return jnp.power(jnp.maximum(y, 1e-12), gamma)


def apply_ppisp_full(params: Dict, rgb: jnp.ndarray, camera_idx,
                     frame_idx, exposure=None, color_latents=None,
                     pixel_uv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full SPG ISP chain on a rendered [H, W, 3] radiance image.

    ``exposure`` / ``color_latents`` override the per-frame tables (the
    controller path feeds predictions here). pixel_uv defaults to the
    shader's centered max-res-normalized grid (ppisp_usd_spg.cu:184
    computeTileUv with one tile).
    """
    h, w = rgb.shape[:2]
    if pixel_uv is None:
        max_res = float(max(h, w))
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 - h * 0.5) / max_res
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 - w * 0.5) / max_res
        pixel_uv = jnp.stack(
            [jnp.broadcast_to(xs[None, :], (h, w)),
             jnp.broadcast_to(ys[:, None], (h, w))], axis=-1)

    if exposure is None:
        exposure = params["exposure"][frame_idx]
    if color_latents is None:
        color_latents = params["color_latents"][frame_idx]

    resp = 2.0 ** params["responsivity"][camera_idx]
    x = rgb * resp * (2.0 ** exposure)

    # per-channel radial vignetting
    center = params["vig_center"][camera_idx]          # [3, 2]
    alpha = params["vig_alpha"][camera_idx]            # [3, 3]
    delta = pixel_uv[:, :, None, :] - center[None, None]   # [H,W,3,2]
    r2 = jnp.sum(delta * delta, axis=-1)               # [H,W,3]
    falloff = 1.0 + alpha[None, None, :, 0] * r2 \
        + alpha[None, None, :, 1] * r2 * r2 \
        + alpha[None, None, :, 2] * r2 * r2 * r2
    x = x * jnp.clip(falloff, 0.0, 1.0)

    # chromaticity homography on (r, g, intensity)
    hmat = compute_homography(color_latents)           # [3, 3]
    intensity = jnp.sum(x, axis=-1, keepdims=True)
    rgi = jnp.concatenate([x[..., 0:1], x[..., 1:2], intensity], axis=-1)
    rgi = jnp.einsum("ij,hwj->hwi", hmat, rgi, precision="highest")
    scale = intensity / (rgi[..., 2:3] + 1e-5)
    rgi = rgi * scale
    x = jnp.concatenate(
        [rgi[..., 0:1], rgi[..., 1:2],
         rgi[..., 2:3] - rgi[..., 0:1] - rgi[..., 1:2]], axis=-1)

    return apply_crf(x, params["crf"][camera_idx])


# ---------------------------------------------------------------------------
# controller CNN (ControllerArchitectureSpec defaults)
# ---------------------------------------------------------------------------

CONTROLLER_SPEC = dict(
    input_downsampling=3, cnn_in_channels=3, cnn_layer_1_channels=16,
    cnn_layer_2_channels=32, cnn_feature_dim=64, pool_grid=(5, 5),
    mlp_hidden_dim=128, num_mlp_trunk_layers=3, color_params_per_frame=8,
)


def _adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]):
    """AdaptiveAvgPool2d equivalent for [H, W, C]."""
    h, w = x.shape[0], x.shape[1]
    oh, ow = out_hw
    # torch adaptive pooling bins: [floor(i*h/oh), ceil((i+1)*h/oh))
    rows = []
    for i in range(oh):
        y0, y1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            x0, x1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[y0:y1, x0:x1], axis=(0, 1)))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)                      # [oh, ow, C]


class PPISPControllerCNN:
    """Image-conditioned controller predicting per-frame
    (exposure offset, 8 color latents) — the reference PPISP
    controller's CNN/MLP architecture (ControllerArchitectureSpec)."""

    def __init__(self, seed: int = 0):
        from flax import linen as nn
        spec = CONTROLLER_SPEC

        class Net(nn.Module):
            @nn.compact
            def __call__(self, img, prior_exposure):
                # img: [H, W, 3] HDR radiance; 1x1 convs are per-pixel
                # Dense layers
                s = spec["input_downsampling"]
                x = nn.Dense(spec["cnn_layer_1_channels"],
                             name="conv1")(img)
                x = nn.relu(x)
                # MaxPool2d(kernel=stride=s)
                h, w = x.shape[0], x.shape[1]
                x = x[:h - h % s, :w - w % s]
                x = x.reshape(h // s, s, w // s, s, -1).max(axis=(1, 3))
                x = nn.Dense(spec["cnn_layer_2_channels"],
                             name="conv2")(x)
                x = nn.relu(x)
                x = nn.Dense(spec["cnn_feature_dim"], name="conv3")(x)
                x = nn.relu(x)
                x = _adaptive_avg_pool(x, spec["pool_grid"])
                feat = jnp.concatenate(
                    [x.reshape(-1), prior_exposure.reshape(1)])
                t = feat
                for i in range(spec["num_mlp_trunk_layers"]):
                    t = nn.Dense(spec["mlp_hidden_dim"],
                                 name=f"trunk{i}")(t)
                    t = nn.relu(t)
                exposure = nn.Dense(1, name="exposure_head")(t)
                color = nn.Dense(spec["color_params_per_frame"],
                                 name="color_head")(t)
                return exposure[0], color

        self.module = Net()
        dummy = jnp.zeros((30, 30, 3))
        self.params = self.module.init(jax.random.PRNGKey(seed), dummy,
                                       jnp.zeros(()))

    def predict(self, params, img: jnp.ndarray, prior_exposure=0.0):
        return self.module.apply(params, img,
                                 jnp.asarray(prior_exposure, jnp.float32))


def flatten_controller_weights(params) -> np.ndarray:
    """Flatten controller weights into the reference export layout
    (ppisp_controller_weights.py:318): conv1 w+b, conv2 w+b, conv3 w+b,
    trunk layers w+b, exposure head w+b, color head w+b; conv weights
    as [out, in] row-major, linear weights as [out, in] row-major."""
    p = params["params"]
    order = (["conv1", "conv2", "conv3"]
             + [f"trunk{i}"
                for i in range(CONTROLLER_SPEC["num_mlp_trunk_layers"])]
             + ["exposure_head", "color_head"])
    chunks = []
    for name in order:
        kernel = np.asarray(p[name]["kernel"], np.float32)   # [in, out]
        bias = np.asarray(p[name]["bias"], np.float32)
        chunks.append(kernel.T.reshape(-1))                  # [out, in]
        chunks.append(bias.reshape(-1))
    flat = np.concatenate(chunks)
    expected = _expected_weights_len()
    assert flat.size == expected, (flat.size, expected)
    return flat


def _expected_weights_len() -> int:
    s = CONTROLLER_SPEC
    pool = s["pool_grid"][0] * s["pool_grid"][1]
    trunk_in = s["cnn_feature_dim"] * pool + 1
    n = (s["cnn_layer_1_channels"] * s["cnn_in_channels"]
         + s["cnn_layer_1_channels"])
    n += (s["cnn_layer_2_channels"] * s["cnn_layer_1_channels"]
          + s["cnn_layer_2_channels"])
    n += s["cnn_feature_dim"] * s["cnn_layer_2_channels"] \
        + s["cnn_feature_dim"]
    n += s["mlp_hidden_dim"] * trunk_in + s["mlp_hidden_dim"]
    n += (s["num_mlp_trunk_layers"] - 1) * (
        s["mlp_hidden_dim"] * s["mlp_hidden_dim"] + s["mlp_hidden_dim"])
    n += 1 * s["mlp_hidden_dim"] + 1
    n += s["color_params_per_frame"] * s["mlp_hidden_dim"] \
        + s["color_params_per_frame"]
    return n

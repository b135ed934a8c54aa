"""Optimization-based SH bake of fixed post-processing transforms.

Reference: threedgrut/export/usd/post_processing/sh_bake.py — clone the
model, freeze everything except the SH coefficient tensors, and run a
photometric fit so that rendering the baked model WITHOUT the ISP
reproduces rendering the original model WITH the ISP. This folds the
nonlinear parts (vignetting averaged over views, homography
normalization, CRF) into the coefficients as far as SH expressivity
allows; the linear exposure part is used as the warm start
(scale_sh_output, sh_bake.py:33 — see usd.bake_ppisp_into_sh).

TPU design: one jitted Adam loop over (features_albedo,
features_specular) with the render closure supplied by the caller —
the bake is renderer-agnostic (3DGUT rasterizer or 3DGRT tracer).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SH_C0 = 0.28209479177387814


def scale_sh_warm_start(features_albedo: jnp.ndarray,
                        features_specular: jnp.ndarray,
                        scale: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference scale_sh_output (sh_bake.py:33): scale the SH output by
    ``s`` with DC compensation for the +0.5 radiance offset."""
    s = float(scale)
    alb = features_albedo * s + (s - 1.0) * 0.5 / SH_C0
    spec = features_specular * s
    return alb, spec


def bake_post_processing(render_fn: Callable,
                         apply_isp_fn: Callable,
                         features_albedo: jnp.ndarray,
                         features_specular: jnp.ndarray,
                         frames: Sequence,
                         iters: int = 3000,
                         lr: float = 2e-3,
                         warm_start_scale: Optional[float] = None,
                         log_every: int = 0) -> Dict:
    """Fit SH coefficients so un-ISP'd renders match ISP'd renders.

    Args:
        render_fn: (albedo, specular, frame) -> [H, W, 3] rendered
            radiance with the given SH tensors on the frozen geometry.
        apply_isp_fn: (rgb, frame) -> [H, W, 3] post-processed target
            transform (the fixed ISP for that frame's camera).
        features_albedo / features_specular: initial SH coefficients.
        frames: sequence of frame descriptors cycled through round-robin
            (cameras / indices — opaque to this function).
        iters: optimization steps (reference default 3000).
        warm_start_scale: optional linear pre-scale (e.g. mean
            responsivity*2^exposure) applied via scale_sh_warm_start.
    Returns: dict with baked ``features_albedo`` / ``features_specular``
        and the loss history.
    """
    alb, spec = features_albedo, features_specular
    if warm_start_scale is not None:
        alb, spec = scale_sh_warm_start(alb, spec, warm_start_scale)

    # fixed targets: ISP'd renders of the ORIGINAL coefficients
    targets = [jax.lax.stop_gradient(
        apply_isp_fn(render_fn(features_albedo, features_specular, fr), fr))
        for fr in frames]

    import optax
    tx = optax.adam(lr)
    params = {"albedo": alb, "specular": spec}
    opt = tx.init(params)

    # one jitted update per frame (frame descriptors are opaque Python
    # objects — cameras, indices — so they stay out of the trace)
    def make_update(fr, target):
        @jax.jit
        def update(p, opt):
            def loss_fn(pp):
                pred = render_fn(pp["albedo"], pp["specular"], fr)
                return jnp.mean((pred - target) ** 2)
            l, g = jax.value_and_grad(loss_fn)(p)
            updates, opt2 = tx.update(g, opt)
            return optax.apply_updates(p, updates), opt2, l
        return update

    updates = [make_update(fr, t) for fr, t in zip(frames, targets)]

    history = []
    for i in range(iters):
        params, opt, l = updates[i % len(frames)](params, opt)
        if log_every and (i + 1) % log_every == 0:
            print(f"[sh_bake {i + 1}/{iters}] loss={float(l):.6g}")
        history.append(float(l))
    return {"features_albedo": params["albedo"],
            "features_specular": params["specular"],
            "loss_history": history}


def bake_ppisp(model, ppisp_params: Dict, dataset, ut_conf, raster_cfg,
               sh_degree: int, frame_indices: Optional[Sequence[int]] = None,
               iters: int = 3000, lr: float = 2e-3,
               view_sampling: str = "training", n_views: int = 8,
               log_every: int = 0) -> Dict:
    """Convenience wrapper: bake the trained PPISP of a 3DGUT model.

    Renders through render_gut on the frozen geometry; the warm start is
    the mean linear scale over the selected frames.

    view_sampling (reference sh_bake.py view_sampling):
      * ``"training"`` — fit on the selected training views directly.
      * ``"trajectory"`` — order the training views along a smooth path
        and fit on ``n_views`` poses slerped along it, with per-frame
        ISP params lerped by the same segment weight
        (export/view_interpolation.py).
    """
    import dataclasses

    from ..models.post_processing import apply_ppisp
    from ..render.gut import render_gut
    from ..train.trainer import camera_from_batch

    if view_sampling == "trajectory":
        from .view_interpolation import TrajectoryViewSampler
        poses = np.asarray(dataset.get_poses())
        sampler = TrajectoryViewSampler(poses)
        template = dataset[0]
        cams, isp_overrides = [], []
        exp = np.asarray(ppisp_params["exposure"])
        lat = np.asarray(ppisp_params["color_latents"])
        for t in np.linspace(0.0, 1.0, n_views):
            pose, (lo, hi, s) = sampler.sample(float(t))
            b = dataclasses.replace(template,
                                    T_to_world=pose.astype(np.float32))
            cams.append(camera_from_batch(b, ut_conf))
            isp_overrides.append((
                jnp.asarray(sampler.interpolate_frame_values(exp, lo, hi, s),
                            jnp.float32),
                jnp.asarray(sampler.interpolate_frame_values(lat, lo, hi, s),
                            jnp.float32)))
        exp_for_warm = np.asarray([float(e) for e, _ in isp_overrides])
    elif view_sampling == "training":
        idxs = list(frame_indices if frame_indices is not None
                    else range(min(len(dataset), n_views)))
        cams = [camera_from_batch(dataset[i], ut_conf) for i in idxs]
        isp_overrides = [(None, None)] * len(idxs)
        exp_for_warm = np.asarray(ppisp_params["exposure"])[np.asarray(idxs)]
    else:
        raise ValueError(f"unknown view_sampling mode {view_sampling!r}")

    def render_fn(alb, spec, fr_idx):
        m = model.replace(params=model.params.replace(
            features_albedo=alb, features_specular=spec))
        return render_gut(cams[fr_idx], ut_conf, raster_cfg, m,
                          sh_degree)["pred_features"]

    def isp_fn(rgb, fr_idx):
        e_ov, l_ov = isp_overrides[fr_idx]
        frame = (idxs[fr_idx] if view_sampling == "training" else 0)
        return apply_ppisp(ppisp_params, rgb, 0, frame,
                           exposure=e_ov, color_latents=l_ov)

    resp = float(np.asarray(ppisp_params["responsivity"])[0])
    warm = 2.0 ** (resp + float(np.mean(exp_for_warm)))

    return bake_post_processing(
        render_fn, isp_fn, model.params.features_albedo,
        model.params.features_specular, list(range(len(cams))),
        iters=iters, lr=lr, warm_start_scale=warm, log_every=log_every)

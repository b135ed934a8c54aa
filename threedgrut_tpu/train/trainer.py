"""Training session driver (TPU redesign of threedgrut/trainer.py).

One Trainer owns: dataset iteration, the jitted train step (render ->
losses -> grads -> masked Adam), strategy callbacks (GS or MCMC) between
steps, LR schedules, checkpointing and validation metrics.

Key behavioral contracts (threedgrut/trainer.py):
- losses: lambda_l1 * L1 + lambda_ssim * (1 - SSIM) + optional opacity /
  scale regularizers (trainer.py:677-750),
- per-group LRs with the positions LR scaled by scene extent
  (model.py:824-826), exp decay on positions, cosine on features,
- strategy hooks: post_backward (grad buffer), post_optimizer_step
  (densify/prune/relocate) (trainer.py:1182-1243),
- progressive SH degree growth every increase_frequency steps
  (model.py:886, trainer.py:1240),
- selective-adam visibility masking (trainer.py:1216-1227).

Everything device-side is a pure jitted function; the Python loop only
sequences steps and host-side conditions (step schedules).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import background as bg_mod
from ..models.gaussians import GaussianParams, GaussianState
from ..ops.cameras import make_pinhole, make_fisheye
from ..ops.quaternion import quat_to_rotmat
from ..ops.ssim import psnr, ssim
from ..ops.ut import UTConfig
from ..optimizers import adam as adam_mod
from ..render.common import RasterConfig
from ..render.gut import render_gut
from ..strategy import base as strat_base
from ..strategy import gs as gs_strategy
from ..strategy import mcmc as mcmc_strategy


@dataclasses.dataclass
class LossConfig:
    use_l1: bool = True
    lambda_l1: float = 0.8
    use_l2: bool = False
    lambda_l2: float = 1.0
    use_ssim: bool = True
    lambda_ssim: float = 0.2
    use_opacity: bool = False
    lambda_opacity: float = 0.0
    use_scale: bool = False
    lambda_scale: float = 0.0


@dataclasses.dataclass
class OptimizerConfig:
    """configs/base_gs.yaml optimizer block."""
    type: str = "adam"  # adam | selective_adam
    eps: float = 1e-15
    lr_positions: float = 0.00016
    lr_density: float = 0.05
    lr_features_albedo: float = 0.0025
    lr_features_specular: float = 0.000125
    lr_features: float = 0.015
    lr_rotation: float = 0.001
    lr_scale: float = 0.005
    # schedulers
    positions_lr_final: float = 0.0000016
    positions_max_steps: int = 30000
    features_decay_final: float = 0.1
    features_max_steps: int = 30000
    # Tail decay on the otherwise-constant LR groups (features_albedo/
    # specular, rotation, scale, density): cosine from tail_start_frac of
    # positions_max_steps down to tail_final_scale at the end. The
    # reference keeps these constant (configs/base_gs.yaml), but both
    # round-3 30k protocols peaked ~20k and drifted -0.3 dB to 30k with
    # constant tails (NOTES.md); annealing the remaining groups removes
    # the late-training noise floor. Set tail_final_scale=1.0 to recover
    # exact reference behavior.
    tail_start_frac: float = 0.66
    tail_final_scale: float = 0.1


@dataclasses.dataclass
class TrainerConfig:
    n_iterations: int = 30000
    strategy: str = "gs"  # gs | mcmc
    background: bg_mod.BackgroundConfig = dataclasses.field(
        default_factory=bg_mod.BackgroundConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig)
    gs: gs_strategy.GSStrategyConfig = dataclasses.field(
        default_factory=gs_strategy.GSStrategyConfig)
    mcmc: mcmc_strategy.MCMCStrategyConfig = dataclasses.field(
        default_factory=mcmc_strategy.MCMCStrategyConfig)
    ut: UTConfig = dataclasses.field(default_factory=UTConfig)
    raster: RasterConfig = dataclasses.field(default_factory=RasterConfig)
    # progressive SH
    init_n_features: int = 0
    max_n_features: int = 3
    increase_frequency: int = 1000
    increase_step: int = 1
    val_frequency: int = 5000
    seed: int = 42
    print_stats: bool = False
    # auto-size the pair budget to the workload: start from
    # raster.max_pairs, grow on overflow, shrink when the observed peak
    # leaves >2x headroom (every pair-scaled stage does proportionally
    # less work; right-sizing measured 9.81 -> 12.03 it/s on bench).
    # Each resize re-jits the train step, so changes are hysteretic and
    # milestone-aligned.
    auto_max_pairs: bool = True
    max_pairs_headroom: float = 1.3
    max_pairs_calibrate_every: int = 500
    # NHT decoder phases. color-refine freezes gaussians for the LAST
    # nht_color_refine_steps (reference nht_decoder.color_refine_steps).
    # nht_warmup_steps freezes them for the FIRST N steps — a TPU-recipe
    # addition (no reference analogue): with a cold random decoder the
    # image gradient reaching gaussian opacity is ~75x weaker than the
    # SH path's (round-5 probe), so the densify pressure razes the cloud
    # before the decoder couples latents to colors; a short decoder-only
    # phase bootstraps the coupling first.
    nht_color_refine_steps: int = 3000
    nht_warmup_steps: int = 0
    # learned post-processing (models/post_processing.py):
    # None | "linear-to-srgb" | "ppisp"
    post_processing: Optional[str] = None
    ppisp_lr: float = 1e-3
    ppisp_use_controller: bool = True
    ppisp_n_distillation_steps: int = 5000


_SHUTTER_NAMES = {
    "global": 0, "rolling_top_to_bottom": 1, "rolling_left_to_right": 2,
    "rolling_bottom_to_top": 3, "rolling_right_to_left": 4,
}


def camera_from_batch(batch, ut_cfg: UTConfig) -> Any:
    """Build a CameraModel from a Batch (T_to_world + intrinsics +
    shutter). Rolling shutter engages when the batch carries an end pose
    (tracer.py:354-488 SensorPose3D construction)."""
    c2w = np.asarray(batch.T_to_world, np.float64)
    r_wc = c2w[:3, :3].T
    t_wc = -r_wc @ c2w[:3, 3]
    q_wc = _rotmat_to_quat(r_wc)
    kw = dict(t=t_wc.astype(np.float32), q=q_wc.astype(np.float32))
    if batch.T_to_world_end is not None:
        c2we = np.asarray(batch.T_to_world_end, np.float64)
        r2 = c2we[:3, :3].T
        kw["t_end"] = (-r2 @ c2we[:3, 3]).astype(np.float32)
        kw["q_end"] = _rotmat_to_quat(r2).astype(np.float32)
        kw["shutter_type"] = _SHUTTER_NAMES.get(
            str(getattr(batch, "shutter_type", "global")).lower(), 0)
    w, h = batch.resolution
    fish = batch.intrinsics_OpenCVFisheyeCameraModelParameters
    if fish is not None:
        return make_fisheye((w, h), (fish["fx"], fish["fy"]),
                            (fish["cx"], fish["cy"]), fish["radial"],
                            fish.get("max_angle", np.pi / 2), **kw)
    fth = batch.intrinsics_FThetaCameraModelParameters
    if fth is not None:
        from ..ops.cameras import make_ftheta
        return make_ftheta(
            (w, h), (fth["cx"], fth["cy"]),
            fth["angle_to_pixeldist"], fth["pixeldist_to_angle"],
            fth.get("reference_poly", 0),
            fth.get("linear_cde", (1.0, 0.0, 0.0)),
            fth.get("max_angle", np.pi / 2), **kw)
    pin = batch.intrinsics_OpenCVPinholeCameraModelParameters
    if pin is not None:
        return make_pinhole((w, h), (pin["fx"], pin["fy"]),
                            (pin["cx"], pin["cy"]), radial=pin["radial"],
                            tangential=pin["tangential"],
                            thin_prism=pin["thin_prism"], **kw)
    fx, fy, cx, cy = batch.intrinsics
    return make_pinhole((w, h), (fx, fy), (cx, cy), **kw)


def _rotmat_to_quat(r: np.ndarray) -> np.ndarray:
    """Rotation matrix -> (w,x,y,z) unit quaternion (Shepperd's method)."""
    t = np.trace(r)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                         (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
    i = int(np.argmax(np.diag(r)))
    if i == 0:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        q = [(r[2, 1] - r[1, 2]) / s, 0.25 * s,
             (r[0, 1] + r[1, 0]) / s, (r[0, 2] + r[2, 0]) / s]
    elif i == 1:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        q = [(r[0, 2] - r[2, 0]) / s, (r[0, 1] + r[1, 0]) / s,
             0.25 * s, (r[1, 2] + r[2, 1]) / s]
    else:
        s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
        q = [(r[1, 0] - r[0, 1]) / s, (r[0, 2] + r[2, 0]) / s,
             (r[1, 2] + r[2, 1]) / s, 0.25 * s]
    q = np.asarray(q)
    return q / np.linalg.norm(q)


class Trainer:
    """3DGUT training session over a BoundedMultiViewDataset."""

    def __init__(self, conf: TrainerConfig, dataset, model: GaussianState,
                 val_dataset=None, out_dir: Optional[str] = None,
                 enable_writer: bool = False, raw_conf: Optional[dict] = None):
        self.conf = conf
        # full resolved config dict; embedded in checkpoints so eval can
        # re-instantiate without the original config files (reference
        # trainer.py:1036-1084 checkpoint contents + render.py:107)
        self.raw_conf = raw_conf
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.model = model
        self.out_dir = out_dir
        self.writer = None
        if enable_writer and out_dir:
            from ..utils.misc import create_summary_writer
            self.writer = create_summary_writer(out_dir)
        self.scene_extent = float(dataset.get_scene_extent())
        self.global_step = 0
        self.key = jax.random.PRNGKey(conf.seed)

        # NHT feature decoder (threedgrut/model/feature_decoder.py)
        self.decoder = None
        if model.config.feature_type == "nht":
            from ..models.nht_decoder import FeatureDecoder
            interp_dim = model.params.features.shape[1] // 4
            self.decoder = FeatureDecoder(ray_feature_dim=interp_dim * 2,
                                          seed=conf.seed)

        # learned ISP (reference: external ppisp package; trainer hooks
        # threedgrut/trainer.py:462-526): per-frame/per-camera parameters
        # trained jointly, controller distilled afterwards for novel views
        self.ppisp_params = None
        self.ppisp_controller = None
        if conf.post_processing == "ppisp":
            from ..models.post_processing import init_ppisp_params
            self.ppisp_params = init_ppisp_params(
                n_cameras=1, n_frames=len(dataset))

        self.opt_state = adam_mod.init_adam_state(self._params_dict())
        if conf.strategy == "gs":
            self.gs_buffers = gs_strategy.init_buffers(model.capacity)
            self.gs_weight_buf = jnp.zeros(model.capacity, jnp.float32)
        self.n_active_features = conf.init_n_features

        oc = conf.optimizer
        self._schedulers = {
            "positions": adam_mod.exp_scheduler(
                oc.lr_positions * self.scene_extent,
                oc.positions_lr_final * self.scene_extent,
                oc.positions_max_steps),
            "features": adam_mod.cosine_scheduler(
                oc.lr_features, oc.lr_features * oc.features_decay_final,
                oc.features_max_steps),
        }
        self._train_step_cache: Dict[Any, Any] = {}
        self.metrics_history = []
        self.train_wall_time = 0.0   # cumulative run_training seconds
        # device-resident GT frames [F, H, W, 3]: every host->device
        # upload LEAKS its size in host RSS through the axon tunnel
        # (measured ~190 MB/dispatch at bench scale - a 30k-iteration
        # run OOMs the 125 GB host), so training GT is uploaded ONCE
        # and indexed on device. None = not built yet; False = dataset
        # not cacheable (ragged shapes / too large).
        self._gts_dev: Any = None
        self._frame_cams: Any = None
        self._val_gts_dev: Dict[Any, Any] = {}
        self.gt_cache_limit_bytes = 6 << 30
        # pair-budget auto-calibration state
        self._max_pairs = conf.raster.max_pairs
        self._peak_pairs = 0
        self._pairs_dirty = True  # sample every step until first calib
        # strategy-event stats held as DEVICE scalars and flushed at log
        # boundaries: printing int(...) per event forces a pipeline sync
        # every event (measured: strategy phase 5-7 it/s vs 16+ coasting)
        self._pending_event_stats = []

    # ------------------------------------------------------------------

    def _params_dict(self) -> dict:
        p = self.model.params
        d = dict(positions=p.positions, rotation=p.rotation, scale=p.scale,
                 density=p.density)
        if p.features_albedo is not None:
            d["features_albedo"] = p.features_albedo
            d["features_specular"] = p.features_specular
        if p.features is not None:
            d["features"] = p.features
        if self.decoder is not None:
            d["nht_decoder"] = self.decoder.params
        if self.ppisp_params is not None:
            d["ppisp"] = self.ppisp_params
        return d

    def _set_params_dict(self, d: dict):
        d = dict(d)
        dec = d.pop("nht_decoder", None)
        if self.decoder is not None and dec is not None:
            self.decoder.params = dec
        isp = d.pop("ppisp", None)
        if self.ppisp_params is not None and isp is not None:
            self.ppisp_params = isp
        self.model = self.model.replace(
            params=self.model.params.replace(**d))

    def current_lrs(self, step: Optional[int] = None) -> Dict[str, float]:
        step = self.global_step if step is None else step
        oc = self.conf.optimizer
        # cosine tail on the constant LR groups (see OptimizerConfig
        # tail_* rationale); 1.0 until tail_start, -> tail_final_scale
        tail = 1.0
        if oc.tail_final_scale < 1.0:
            t0 = oc.tail_start_frac * oc.positions_max_steps
            if step > t0:
                u = min((step - t0) / max(oc.positions_max_steps - t0, 1.0),
                        1.0)
                tail = (oc.tail_final_scale
                        + 0.5 * (1.0 - oc.tail_final_scale)
                        * (1.0 + float(np.cos(np.pi * u))))
        lrs = {
            "positions": self._schedulers["positions"](step),
            "rotation": oc.lr_rotation * tail,
            "scale": oc.lr_scale * tail,
            "density": oc.lr_density * tail,
        }
        if self.model.params.features_albedo is not None:
            lrs["features_albedo"] = oc.lr_features_albedo * tail
            lrs["features_specular"] = oc.lr_features_specular * tail
        if self.model.params.features is not None:
            lrs["features"] = self._schedulers["features"](step)
        if self.decoder is not None:
            # cosine decay (base_gs.yaml nht_decoder.scheduler)
            lrs["nht_decoder"] = adam_mod.cosine_scheduler(
                0.00068, 0.00068 * 0.1, oc.features_max_steps)(step)
        if self.ppisp_params is not None:
            lrs["ppisp"] = self.conf.ppisp_lr
        # color-refine phase: freeze the GEOMETRY groups only — the
        # reference freezes exactly {positions, scale, rotation,
        # density} (trainer.py:95 _color_refine_frozen_param_names);
        # the NHT latents keep training alongside the decoder. (Round-5
        # fix: the first cut froze the latents too, which turns both
        # refine and warmup into decoder-only fits.)
        if self._in_color_refine(step):
            for k in ("positions", "scale", "rotation", "density"):
                if k in lrs:
                    lrs[k] = 0.0
        return lrs

    def _in_color_refine(self, step: Optional[int] = None) -> bool:
        if self.decoder is None:
            return False
        step = self.global_step if step is None else step
        if step < self.conf.nht_warmup_steps:
            return True  # decoder-warmup phase: same freeze as refine
        refine_steps = self.conf.nht_color_refine_steps
        return step >= max(self.conf.n_iterations - refine_steps, 0)

    # --- pair-budget auto-calibration -----------------------------------

    def _raster_cfg(self) -> RasterConfig:
        if not self.conf.auto_max_pairs:
            return self.conf.raster
        return self.conf.raster.replace(max_pairs=self._max_pairs)

    @staticmethod
    def _round_pairs(x: float) -> int:
        """Round UP to a bounded geometric ladder (8192 * 1.5^k).

        Every distinct budget is a fresh XLA compile of the train step
        (10-40 min cold through the remote compile service); quantizing
        to ~1.5x rungs caps the number of distinct programs a training
        run can ever request (~30 rungs to 2^31) instead of one per
        8192-pair increment."""
        x = max(int(x), 8192)
        rung = 8192
        while rung < x:
            rung = ((int(rung * 1.5) + 8191) // 8192) * 8192
        return rung

    def _calibrate_pairs(self, metrics, last_k: int = 1):
        """Grow the pair budget on overflow; shrink at milestones when the
        observed peak leaves >2x headroom. Both re-jit the train step.

        ``last_k``: steps covered by the dispatch that produced
        ``metrics`` - grouped steps calibrate when the group CROSSES a
        gate boundary (exact multiples rarely land on group ends)."""
        if not self.conf.auto_max_pairs:
            return
        step = self.global_step
        every = max(self.conf.max_pairs_calibrate_every, 1)

        def crossed(period):
            return (step // period) != ((step - last_k) // period)

        if not (step <= 10 + last_k or crossed(min(50, every))
                or crossed(every)):
            return
        pairs = int(metrics["pairs"])
        overflow = int(metrics["overflow"])
        self._peak_pairs = max(self._peak_pairs, pairs + overflow)
        head = self.conf.max_pairs_headroom
        if overflow > 0:
            new = self._round_pairs(self._peak_pairs * head)
            if self.conf.print_stats and new != self._max_pairs:
                print(f"[{step}] pair budget overflow ({overflow}): "
                      f"{self._max_pairs} -> {new}")
            self._max_pairs = max(new, self._max_pairs)
            return
        if crossed(every) and step > last_k:
            target = self._round_pairs(self._peak_pairs * head)
            if target < self._max_pairs // 2:
                if self.conf.print_stats:
                    print(f"[{step}] pair budget shrink: "
                          f"{self._max_pairs} -> {target}")
                self._max_pairs = target
            # decay so later prunes can shrink the budget again
            self._peak_pairs = int(self._peak_pairs * 0.5)

    # ------------------------------------------------------------------

    def _make_step_core(self, sh_degree: int):
        """Pure (params, opt, lrs, gt, n_active, key, cam, frame_idx) ->
        (new_params, new_opt, grads, metrics) train-step body, shared by
        the single-step jit and the fused multi-step scan.

        The camera is a traced pytree argument - its pose/intrinsics change
        every frame without recompiling; only resolution/model enums (static
        fields) specialize the compile.
        """
        conf = self.conf
        base_model = self.model
        selective = conf.optimizer.type == "selective_adam"
        raster_cfg = self._raster_cfg()

        use_ppisp = conf.post_processing == "ppisp"

        def step_fn(params_d, opt_state, lrs, rgb_gt, n_active, key, cam,
                    frame_idx):
            gauss_d = {k: v for k, v in params_d.items()
                       if k not in ("nht_decoder", "ppisp")}
            model = base_model.replace(
                params=base_model.params.replace(**gauss_d),
                n_active=n_active)

            decoder = self.decoder

            def loss_fn(pd):
                pd = dict(pd)
                dec_params = pd.pop("nht_decoder", None)
                isp_params = pd.pop("ppisp", None)
                m = model.replace(params=model.params.replace(**pd))
                out = render_gut(cam, conf.ut, raster_cfg, m, sh_degree)
                pred = out["pred_features"]
                if decoder is not None:
                    from ..render.common import camera_rays_world
                    _, dirs = camera_rays_world(cam)
                    hh, ww = pred.shape[:2]
                    pred = decoder.apply(
                        dec_params, pred.reshape(-1, pred.shape[-1]),
                        dirs.reshape(-1, 3)).reshape(hh, ww, 3)
                bg = bg_mod.background_color(conf.background, key, train=True)
                pred = bg_mod.apply_background(pred,
                                               out["pred_opacity"], bg)
                if use_ppisp:
                    # model the capture-time ISP on the prediction so the
                    # radiance field stays linear (trainer.py:462-526)
                    from ..models.post_processing import apply_ppisp
                    pred = apply_ppisp(isp_params, pred, 0, frame_idx)
                elif conf.post_processing == "linear-to-srgb":
                    from ..utils.misc import linear_to_srgb
                    pred = linear_to_srgb(jnp.clip(pred, 0.0, 1.0))
                losses = {}
                total = 0.0
                if conf.loss.use_l1:
                    l1 = jnp.mean(jnp.abs(pred - rgb_gt))
                    losses["l1"] = l1
                    total = total + conf.loss.lambda_l1 * l1
                if conf.loss.use_l2:
                    l2 = jnp.mean((pred - rgb_gt) ** 2)
                    losses["l2"] = l2
                    total = total + conf.loss.lambda_l2 * l2
                if conf.loss.use_ssim:
                    s = ssim(pred.transpose(2, 0, 1)[None],
                             rgb_gt.transpose(2, 0, 1)[None])
                    losses["ssim"] = 1.0 - s
                    total = total + conf.loss.lambda_ssim * (1.0 - s)
                if conf.loss.use_opacity:
                    lo = jnp.mean(jnp.abs(m.get_density()))
                    losses["opacity"] = lo
                    total = total + conf.loss.lambda_opacity * lo
                if conf.loss.use_scale:
                    ls = jnp.mean(jnp.abs(m.get_scale()))
                    losses["scale"] = ls
                    total = total + conf.loss.lambda_scale * ls
                losses["total"] = total
                aux = dict(losses=losses, pred=pred,
                           visibility=out["mog_visibility"],
                           pairs=out["num_pairs"],
                           overflow=out["pairs_overflow"])
                return total, aux

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_d)
            visibility = aux["visibility"] if selective else None
            active_mask = (jnp.arange(base_model.capacity, dtype=jnp.int32)
                           < n_active)
            new_params, new_opt = adam_mod.adam_step(
                params_d, grads, opt_state, lrs, eps=conf.optimizer.eps,
                visibility=visibility, update_mask=active_mask)
            metrics = dict(aux["losses"])
            metrics["psnr"] = psnr(jnp.clip(aux["pred"], 0, 1), rgb_gt)
            metrics["pairs"] = aux["pairs"]
            metrics["overflow"] = aux["overflow"]
            return new_params, new_opt, grads, metrics

        return step_fn

    def _build_train_step(self, sh_degree: int):
        return jax.jit(self._make_step_core(sh_degree))

    def _build_train_group(self, sh_degree: int, k_steps: int,
                           with_grad_buffer: bool,
                           with_perturb: bool = False,
                           with_ema: bool = False,
                           end_events: tuple = ()):
        """K train steps fused into ONE device dispatch via lax.scan.

        The reference pays per-iteration kernel-launch overhead on every
        step; on TPU the per-dispatch runtime cost is ~5-10 ms, so the
        trainer batches all steps between host-side events (strategy
        hooks, progressive SH, calibration) into one jitted program.
        Per-step state that would otherwise force one dispatch per step
        rides INSIDE the scan: the GS gradient buffer
        (strategy/gs.py:130-141), MCMC's every-step position
        perturbation (with_perturb), and the NHT decoder's EMA shadow
        (with_ema; feature_decoder.py ema_update fires every step).

        ``end_events``: strategy events firing AT the group's final step,
        fused as a static suffix of the same program. ``_plan_group``
        guarantees a group ends exactly on event steps, so the suffix
        needs no in-scan lax.cond; the op order matches the host-
        sequenced ``_post_optimizer_step`` exactly (GS: densify ->
        prune -> reset -> decay; MCMC: relocate -> add). Fusing removes
        the per-event program swaps that dominated the densification-
        phase wall rate (round-2 NOTES: 5-7 it/s vs 16+ coasting).
        """
        core = self._make_step_core(sh_degree)
        base_model = self.model
        noise_lr = self.conf.mcmc.noise_lr
        ema_decay = (self.decoder.ema_decay
                     if self.decoder is not None else 0.0)
        gs_conf = self.conf.gs
        mcmc_conf = self.conf.mcmc
        scene_extent = self.scene_extent

        @jax.jit
        def group_fn(params_d, opt_state, gs_accum, gs_denom, ema_shadow,
                     n_active, lrs_stack, gts, keys, cams, frame_idxs,
                     event_key):
            def body(carry, xs):
                pd, opt, ga, gd, ema = carry
                lrs, gt, key, cam, fidx = xs
                new_p, new_o, grads, metrics = core(
                    pd, opt, lrs, gt, n_active, key, cam, fidx)
                if with_grad_buffer:
                    from ..ops.ut import sensor_position
                    buf = gs_strategy.update_gradient_buffer(
                        gs_strategy.GSBuffers(ga, gd), grads["positions"],
                        new_p["positions"], sensor_position(cam))
                    ga, gd = buf.grad_norm_accum, buf.grad_norm_denom
                if with_perturb:
                    gauss_d = {k2: v for k2, v in new_p.items()
                               if k2 not in ("nht_decoder", "ppisp")}
                    m2 = base_model.replace(
                        params=base_model.params.replace(**gauss_d),
                        n_active=n_active)
                    m2 = mcmc_strategy.perturb(
                        m2, jax.random.fold_in(key, 77),
                        lrs["positions"], noise_lr)
                    new_p = dict(new_p)
                    new_p["positions"] = m2.params.positions
                if with_ema:
                    ema = jax.tree.map(
                        lambda s, p: ema_decay * s + (1.0 - ema_decay) * p,
                        ema, new_p["nht_decoder"])
                return (new_p, new_o, ga, gd, ema), metrics

            (pd, opt, ga, gd, ema), metrics = jax.lax.scan(
                body, (params_d, opt_state, gs_accum, gs_denom, ema_shadow),
                (lrs_stack, gts, keys, cams, frame_idxs), length=k_steps)

            ev_stats = {}
            if end_events:
                gauss_d = {k2: v for k2, v in pd.items()
                           if k2 not in ("nht_decoder", "ppisp")}
                st = base_model.replace(
                    params=base_model.params.replace(**gauss_d),
                    n_active=n_active)
                bufs = gs_strategy.GSBuffers(ga, gd)
                if "densify" in end_events:
                    st, opt, bufs, dstats = gs_strategy.densify(
                        st, opt, bufs, scene_extent,
                        jax.random.fold_in(event_key, 1),
                        clone_grad_threshold=gs_conf.clone_grad_threshold,
                        split_grad_threshold=gs_conf.split_grad_threshold,
                        relative_size_threshold=(
                            gs_conf.relative_size_threshold),
                        n_split=gs_conf.split_n_gaussians)
                    ev_stats.update(dstats)
                if "prune" in end_events:
                    st, opt, bufs, n_pruned = gs_strategy.prune_opacity(
                        st, opt, bufs, gs_conf.prune_density_threshold)
                    ev_stats["n_pruned"] = n_pruned
                if "reset" in end_events:
                    st, opt = gs_strategy.reset_density(
                        st, opt, gs_conf.new_max_density)
                if "decay" in end_events:
                    st = gs_strategy.decay_density(
                        st, gs_conf.density_decay_gamma)
                if "relocate" in end_events:
                    st, opt, n_rel = mcmc_strategy.relocate(
                        st, opt, jax.random.fold_in(event_key, 2),
                        opacity_threshold=mcmc_conf.opacity_threshold,
                        n_max=mcmc_conf.binom_n_max)
                    ev_stats["n_relocated"] = n_rel
                if "add" in end_events:
                    st, opt, n_added = mcmc_strategy.add_gaussians(
                        st, opt, jax.random.fold_in(event_key, 3),
                        max_n=mcmc_conf.max_n_gaussians,
                        n_max=mcmc_conf.binom_n_max)
                    ev_stats["n_added"] = n_added
                ga, gd = bufs.grad_norm_accum, bufs.grad_norm_denom
                pd = dict(pd)
                for k2 in gauss_d:
                    pd[k2] = getattr(st.params, k2)
                n_active = st.n_active
            return pd, opt, ga, gd, ema, n_active, ev_stats, metrics

        return group_fn

    def _gt_cache(self):
        """Lazily upload all dataset GT frames to device (one upload).

        Also caches the per-frame CameraModel: once GT lives on device,
        a group dispatch needs only camera metadata - re-reading
        dataset[i] would re-decode the frame image every time (~100 ms
        x 16 per group of pure host overhead)."""
        if self._gts_dev is None:
            try:
                n = len(self.dataset)
                shapes = {tuple(np.asarray(self.dataset[0].rgb_gt).shape)}
                nbytes = 0
                frames, cams = [], []
                for i in range(n):
                    b = self.dataset[i]
                    g = np.asarray(b.rgb_gt, np.float32)
                    shapes.add(g.shape)
                    nbytes += g.nbytes
                    frames.append(g)
                    cams.append(camera_from_batch(b, self.conf.ut))
                    if len(shapes) > 1 or nbytes > self.gt_cache_limit_bytes:
                        break
                if len(shapes) == 1 and nbytes <= self.gt_cache_limit_bytes:
                    self._gts_dev = jnp.asarray(np.stack(frames))
                    self._frame_cams = cams
                else:
                    self._gts_dev = False
                    self._frame_cams = None
            except Exception:
                self._gts_dev = False
                self._frame_cams = None
        return self._gts_dev

    def train_iteration(self, batch, frame_idx: int = 0,
                        gt_dev=None) -> Dict[str, float]:
        cam = camera_from_batch(batch, self.conf.ut)
        sh_degree = min(self.n_active_features, self.conf.max_n_features)
        cache_key = (cam.resolution, cam.model_type, cam.shutter_type,
                     sh_degree, self.model.capacity, self._max_pairs)
        if cache_key not in self._train_step_cache:
            self._train_step_cache[cache_key] = self._build_train_step(
                sh_degree)
        step_fn = self._train_step_cache[cache_key]

        self.key, k = jax.random.split(self.key)
        lrs = {n: jnp.asarray(v, jnp.float32)
               for n, v in self.current_lrs().items()}
        # gt_dev (run_training passes a device-cache slice) avoids the
        # leaking per-dispatch host upload; direct callers fall back
        rgb_gt = gt_dev if gt_dev is not None else jnp.asarray(batch.rgb_gt)
        new_params, new_opt, grads, metrics = step_fn(
            self._params_dict(), self.opt_state, lrs, rgb_gt,
            self.model.n_active, k, cam,
            jnp.asarray(frame_idx, jnp.int32))
        self._last_cam = cam
        self._set_params_dict(new_params)
        self.opt_state = new_opt

        self.global_step += 1
        if self.decoder is not None:
            self.decoder.ema_update(self.global_step)
        self._post_backward(grads, cam)
        self._post_optimizer_step()
        self._progressive_features()
        if self.writer is not None:
            for k2, v in metrics.items():
                self.writer.add_scalar(f"train/{k2}", float(v),
                                       self.global_step)
            self.writer.add_scalar("train/n_gaussians",
                                   int(self.model.n_active),
                                   self.global_step)
        self._calibrate_pairs(metrics)
        # device arrays (float()-able); conversion forces a sync, so leave
        # it to the caller's logging cadence
        return metrics

    # ------------------------------------------------------------------

    def _post_backward(self, grads, cam):
        if self.conf.strategy != "gs":
            return
        c = self.conf.gs
        if strat_base.check_step_condition(self.global_step, 0,
                                           c.densify_end, 1):
            from ..ops.ut import sensor_position
            self.gs_buffers = gs_strategy.update_gradient_buffer(
                self.gs_buffers, grads["positions"],
                self.model.params.positions, sensor_position(cam))

    def _group_end_events(self, end_step: int) -> tuple:
        """Strategy events firing at ``end_step`` that the fused group
        program applies as a static suffix (same op order as the host
        path below). Only the events whose ops are pure capacity-static
        functions ride in-program; prune_scale / weight telemetry (host
        data deps) stay host-side."""
        ev = []
        if self.conf.strategy == "gs":
            c = self.conf.gs
            for name, (s, e, f) in (
                    ("densify", (c.densify_start, c.densify_end,
                                 c.densify_frequency)),
                    ("prune", (c.prune_start, c.prune_end,
                               c.prune_frequency)),
                    ("reset", (c.reset_density_start, c.reset_density_end,
                               c.reset_density_frequency)),
                    ("decay", (c.density_decay_start, c.density_decay_end,
                               c.density_decay_frequency))):
                if strat_base.check_step_condition(end_step, s, e, f):
                    ev.append(name)
        elif self.conf.strategy == "mcmc":
            c = self.conf.mcmc
            for name, (s, e, f) in (
                    ("relocate", (c.relocate_start, c.relocate_end,
                                  c.relocate_frequency)),
                    ("add", (c.add_start, c.add_end, c.add_frequency))):
                if strat_base.check_step_condition(end_step, s, e, f):
                    ev.append(name)
        return tuple(ev)

    def _post_optimizer_step(self, skip_perturb: bool = False,
                             skip_events: tuple = ()):
        step = self.global_step
        if self.conf.strategy == "gs":
            c = self.conf.gs
            if "densify" not in skip_events and \
                    strat_base.check_step_condition(step, c.densify_start,
                                                    c.densify_end,
                                                    c.densify_frequency):
                self.key, k = jax.random.split(self.key)
                self.model, self.opt_state, self.gs_buffers, stats = \
                    gs_strategy.densify(
                        self.model, self.opt_state, self.gs_buffers,
                        self.scene_extent, k,
                        clone_grad_threshold=c.clone_grad_threshold,
                        split_grad_threshold=c.split_grad_threshold,
                        relative_size_threshold=c.relative_size_threshold,
                        n_split=c.split_n_gaussians)
                if self.conf.print_stats:
                    self._pending_event_stats.append(
                        (step, "densify", dict(stats,
                                               n=self.model.n_active)))
            if "prune" not in skip_events and \
                    strat_base.check_step_condition(step, c.prune_start,
                                                    c.prune_end,
                                                    c.prune_frequency):
                self.model, self.opt_state, self.gs_buffers, n_pruned = \
                    gs_strategy.prune_opacity(self.model, self.opt_state,
                                              self.gs_buffers,
                                              c.prune_density_threshold)
                if self.conf.print_stats:
                    self._pending_event_stats.append(
                        (step, "pruned", dict(n_pruned=n_pruned,
                                              n=self.model.n_active)))
            if "reset" not in skip_events and \
                    strat_base.check_step_condition(step,
                                                    c.reset_density_start,
                                                    c.reset_density_end,
                                                    c.reset_density_frequency):
                self.model, self.opt_state = gs_strategy.reset_density(
                    self.model, self.opt_state, c.new_max_density)
            if "decay" not in skip_events and \
                    strat_base.check_step_condition(step,
                                                    c.density_decay_start,
                                                    c.density_decay_end,
                                                    c.density_decay_frequency):
                self.model = gs_strategy.decay_density(
                    self.model, c.density_decay_gamma)
            if strat_base.check_step_condition(step, c.prune_scale_start,
                                               c.prune_scale_end,
                                               c.prune_scale_frequency):
                poses = np.asarray(self.dataset.get_poses())
                cam_normals = jnp.asarray(poses[:, :3, 2])
                focal = float(self.dataset[0].intrinsics[0])                     if self.dataset[0].intrinsics else 1000.0
                self.model, self.opt_state, self.gs_buffers, _ =                     gs_strategy.prune_scale(
                        self.model, self.opt_state, self.gs_buffers,
                        cam_normals, focal, c.prune_scale_threshold)
            if c.prune_weight_frequency > 0 and strat_base \
                    .check_step_condition(step, c.prune_weight_start,
                                          c.prune_weight_end,
                                          c.weight_telemetry_frequency):
                # sample the current view's blend weights into the
                # running-max buffer (reference accumulates telemetry
                # from every render; we sample every Nth step)
                sh_degree = min(self.n_active_features,
                                self.conf.max_n_features)
                out = render_gut(self._last_cam, self.conf.ut,
                                 self._raster_cfg(), self.model, sh_degree,
                                 weight_telemetry=True)
                self.gs_weight_buf = jnp.maximum(self.gs_weight_buf,
                                                 out["particle_wmax"])
            if strat_base.check_step_condition(step, c.prune_weight_start,
                                               c.prune_weight_end,
                                               c.prune_weight_frequency):
                self.model, self.opt_state, self.gs_buffers, n_pruned = \
                    gs_strategy.prune_weight(
                        self.model, self.opt_state, self.gs_buffers,
                        self.gs_weight_buf, c.prune_weight_threshold)
                # reset so the next window re-accumulates fresh telemetry
                self.gs_weight_buf = jnp.zeros_like(self.gs_weight_buf)
                if self.conf.print_stats:
                    self._pending_event_stats.append(
                        (step, "weight-pruned",
                         dict(n_pruned=n_pruned, n=self.model.n_active)))
        else:
            c = self.conf.mcmc
            if "relocate" not in skip_events and \
                    strat_base.check_step_condition(step, c.relocate_start,
                                                    c.relocate_end,
                                                    c.relocate_frequency):
                self.key, k = jax.random.split(self.key)
                self.model, self.opt_state, n_rel = mcmc_strategy.relocate(
                    self.model, self.opt_state, k,
                    opacity_threshold=c.opacity_threshold,
                    n_max=c.binom_n_max)
            if "add" not in skip_events and \
                    strat_base.check_step_condition(step, c.add_start,
                                                    c.add_end,
                                                    c.add_frequency):
                self.key, k = jax.random.split(self.key)
                self.model, self.opt_state, n_added = \
                    mcmc_strategy.add_gaussians(
                        self.model, self.opt_state, k,
                        max_n=c.max_n_gaussians, n_max=c.binom_n_max)
            if not skip_perturb and strat_base.check_step_condition(
                    step, c.perturb_start, c.perturb_end,
                    c.perturb_frequency):
                self.key, k = jax.random.split(self.key)
                pos_lr = jnp.asarray(
                    self._schedulers["positions"](step), jnp.float32)
                self.model = mcmc_strategy.perturb(self.model, k, pos_lr,
                                                   c.noise_lr)

    def _progressive_features(self):
        conf = self.conf
        if (self.n_active_features < conf.max_n_features
                and conf.increase_frequency > 0
                and self.global_step % conf.increase_frequency == 0):
            self.n_active_features = min(
                conf.max_n_features,
                self.n_active_features + conf.increase_step)

    # --- PPISP controller distillation ----------------------------------

    def distill_ppisp_controller(self, steps: Optional[int] = None,
                                 max_frames: int = 32,
                                 downsample: int = 4):
        """Post-training phase: distill the learned per-frame ISP params
        into the image-conditioned controller CNN so novel (validation)
        views get predicted corrections (reference trainer.py:486
        distillation mode: the controller consumes the rendered HDR
        color and predicts exposure + color latents).

        Renders up to ``max_frames`` training views with the frozen
        model (downsampled — the controller max-pools by 3 and average-
        pools to 5x5, so full resolution adds nothing), then fits the
        CNN outputs to the trained per-frame (exposure, color_latents).
        """
        if self.ppisp_params is None or not self.conf.ppisp_use_controller:
            return None
        from ..models.post_processing import PPISPController
        steps = steps or self.conf.ppisp_n_distillation_steps

        n_frames = min(len(self.dataset), max_frames)
        sh_degree = min(self.n_active_features, self.conf.max_n_features)
        raster_cfg = self._raster_cfg()
        imgs = []
        for i in range(n_frames):
            batch = self.dataset[i]
            cam = camera_from_batch(batch, self.conf.ut)
            out = render_gut(cam, self.conf.ut, raster_cfg, self.model,
                             sh_degree)
            img = out["pred_features"][::downsample, ::downsample, :3]
            imgs.append(img)
        imgs = jnp.stack(imgs)                            # [F, h, w, 3]
        p = self.ppisp_params
        t_exp = jnp.asarray(p["exposure"])[:n_frames]
        t_lat = jnp.asarray(p["color_latents"])[:n_frames]

        ctrl = PPISPController(n_cameras=1, seed=self.conf.seed)
        import optax
        tx = optax.adam(1e-3)
        opt = tx.init(ctrl.params)

        @jax.jit
        def update(params, opt):
            def loss(pr):
                def one(img, te, tl):
                    e, c = ctrl.module.apply(pr, img, jnp.zeros(()))
                    return (e - te) ** 2 + jnp.mean((c - tl) ** 2)
                return jnp.mean(jax.vmap(
                    lambda im, te, tl: one(im, te, tl))(imgs, t_exp, t_lat))
            l, g = jax.value_and_grad(loss)(params)
            updates, opt = tx.update(g, opt)
            return optax.apply_updates(params, updates), opt, l

        loss = None
        for _ in range(steps):
            ctrl.params, opt, loss = update(ctrl.params, opt)
        self.ppisp_controller = ctrl
        self._ppisp_distill_downsample = downsample
        return float(loss) if loss is not None else None

    def _apply_ppisp_eval(self, pred, cam):
        """Validation-time ISP: controller-predicted per-frame params
        (if distilled) through the trained per-camera transform; without
        a controller the per-frame terms stay neutral."""
        from ..models.post_processing import apply_ppisp
        p = {k: jnp.asarray(v) for k, v in self.ppisp_params.items()}
        if self.ppisp_controller is not None:
            ds = getattr(self, "_ppisp_distill_downsample", 4)
            exposure, latents = self.ppisp_controller.predict(
                self.ppisp_controller.params, pred[::ds, ::ds, :3], 0.0)
            return apply_ppisp(p, pred, 0, 0, exposure=exposure,
                               color_latents=latents)
        return apply_ppisp(p, pred, 0, 0,
                           exposure=jnp.zeros(()),
                           color_latents=jnp.zeros((8,)))

    # ------------------------------------------------------------------

    # --- fused multi-step dispatch ---------------------------------------

    #: max train steps fused into one device dispatch between host events.
    #: With strategy events fused into the group program (end_events),
    #: boundaries land on multiples of the event/log cadence (100 in the
    #: GS/MCMC protocols): 25 tiles a 100-step window into four equal
    #: groups of ONE compiled shape (16 needed k=16 AND k=4 programs).
    GROUP_MAX = 25

    def _is_host_event(self, step: int) -> bool:
        """True when host-side work runs AT ``step`` (strategy hooks,
        progressive SH) — a fused group must end on such a step."""
        conf = self.conf
        conds = []
        if conf.strategy == "gs":
            c = conf.gs
            conds = [
                (c.densify_start, c.densify_end, c.densify_frequency),
                (c.prune_start, c.prune_end, c.prune_frequency),
                (c.reset_density_start, c.reset_density_end,
                 c.reset_density_frequency),
                (c.density_decay_start, c.density_decay_end,
                 c.density_decay_frequency),
                (c.prune_scale_start, c.prune_scale_end,
                 c.prune_scale_frequency),
            ]
            if c.prune_weight_frequency > 0:
                conds.append((c.prune_weight_start, c.prune_weight_end,
                              c.weight_telemetry_frequency))
                conds.append((c.prune_weight_start, c.prune_weight_end,
                              c.prune_weight_frequency))
            # the gradient-buffer window edge flips the scan's static
            # with_grad_buffer flag — force a boundary just before the
            # edge so no group straddles it (the update runs for steps
            # strictly below densify_end)
            if step in (c.densify_end - 1, c.densify_end):
                return True
        elif conf.strategy == "mcmc":
            c = conf.mcmc
            conds = [
                (c.relocate_start, c.relocate_end, c.relocate_frequency),
                (c.add_start, c.add_end, c.add_frequency),
            ]
            if c.perturb_frequency == 1:
                # per-step perturb is FUSED into the group scan; only
                # the activity-window edges must break groups (the
                # with_perturb flag is static per program)
                if step in (c.perturb_start, max(c.perturb_end - 1, 0),
                            c.perturb_end):
                    return True
            else:
                conds.append((c.perturb_start, c.perturb_end,
                              c.perturb_frequency))
        if any(strat_base.check_step_condition(step, s, e, f)
               for (s, e, f) in conds):
            return True
        if (self.n_active_features < conf.max_n_features
                and conf.increase_frequency > 0
                and step % conf.increase_frequency == 0):
            return True
        if self.decoder is not None:
            # EMA fusion flag and the color-refine lr freeze are static
            # per group program - break at their activation boundaries
            # (warmup exit is a boundary of the same freeze mechanism)
            refine_at = max(conf.n_iterations - conf.nht_color_refine_steps,
                            0)
            if step in (self.decoder.ema_start_step, refine_at,
                        max(refine_at - 1, 0), conf.nht_warmup_steps,
                        max(conf.nht_warmup_steps - 1, 0)):
                return True
        return False

    def _plan_group(self, n: int, avail: int, log_every: int) -> int:
        """Number of steps to fuse into the next dispatch."""
        k = 0
        while (k < self.GROUP_MAX and self.global_step + k < n
               and k < avail):
            k += 1
            s = self.global_step + k
            if (self._is_host_event(s)
                    or (log_every and s % log_every == 0)):
                break
        return max(k, 1)

    def train_group(self, batches, frame_idxs) -> Dict[str, float]:
        """Run the group's train steps in ONE device dispatch; returns
        the final step's metrics (with group-max pair telemetry).

        ``batches`` may be None when every frame is covered by the
        GT/camera caches (run_training's hot path - avoids re-decoding
        frame images just for their camera metadata)."""
        k = len(batches) if batches is not None else len(frame_idxs)
        if (batches is None or getattr(self, "_frame_cams", None)) and \
                self._gt_cache() is not False and all(
                    0 <= i < len(self._frame_cams) for i in frame_idxs):
            cams = [self._frame_cams[i] for i in frame_idxs]
        else:
            cams = [camera_from_batch(b, self.conf.ut) for b in batches]
        sh_degree = min(self.n_active_features, self.conf.max_n_features)
        c0 = cams[0]
        with_buf = (self.conf.strategy == "gs"
                    and strat_base.check_step_condition(
                        self.global_step + 1, 0, self.conf.gs.densify_end,
                        1))
        cm = self.conf.mcmc
        with_perturb = (self.conf.strategy == "mcmc"
                        and cm.perturb_frequency == 1
                        and strat_base.check_step_condition(
                            self.global_step + 1, cm.perturb_start,
                            cm.perturb_end, 1))
        with_ema = (self.decoder is not None
                    and self.decoder.ema_shadow is not None
                    and self.global_step + 1 >= self.decoder.ema_start_step)
        end_events = self._group_end_events(self.global_step + k)
        cache_key = ("group", k, with_buf, with_perturb, with_ema,
                     end_events,
                     c0.resolution, c0.model_type, c0.shutter_type,
                     sh_degree, self.model.capacity, self._max_pairs)
        if cache_key not in self._train_step_cache:
            self._train_step_cache[cache_key] = self._build_train_group(
                sh_degree, k, with_buf, with_perturb, with_ema, end_events)
        group_fn = self._train_step_cache[cache_key]

        cams_stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *cams)
        cache = self._gt_cache()
        if cache is not False and all(0 <= i < cache.shape[0]
                                      for i in frame_idxs):
            # on-device gather from the one-time GT upload (per-dispatch
            # host uploads leak host RSS through the axon tunnel)
            gts = jnp.take(cache, jnp.asarray(frame_idxs, jnp.int32),
                           axis=0)
        else:
            gts = jnp.stack([jnp.asarray(b.rgb_gt) for b in batches])
        lrs_stack = {}
        for j in range(k):
            for name, v in self.current_lrs(self.global_step + j).items():
                lrs_stack.setdefault(name, []).append(v)
        lrs_stack = {name: jnp.asarray(v, jnp.float32)
                     for name, v in lrs_stack.items()}
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, k)
        self.key, event_key = jax.random.split(self.key)
        fidxs = jnp.asarray(frame_idxs, jnp.int32)

        if self.conf.strategy == "gs":
            ga, gd = self.gs_buffers
        else:
            ga = gd = jnp.zeros((1,), jnp.float32)
        ema = (self.decoder.ema_shadow if with_ema
               else jnp.zeros((1,), jnp.float32))
        new_p, new_o, ga, gd, ema, n_active, ev_stats, mstack = group_fn(
            self._params_dict(), self.opt_state, ga, gd, ema,
            self.model.n_active, lrs_stack, gts, keys, cams_stacked, fidxs,
            event_key)
        self._set_params_dict(new_p)
        self.opt_state = new_o
        if self.conf.strategy == "gs" and (with_buf or end_events):
            self.gs_buffers = gs_strategy.GSBuffers(ga, gd)
        if with_ema:
            self.decoder.ema_shadow = ema
        self._last_cam = cams[-1]
        self.global_step += k
        if end_events:
            self.model = self.model.replace(n_active=n_active)
            if self.conf.print_stats and ev_stats:
                kind = "+".join(end_events)
                self._pending_event_stats.append(
                    (self.global_step, kind,
                     dict(ev_stats, n=n_active)))

        # materializing mstack forces a full pipeline sync per dispatch,
        # killing host/device overlap - only do it when something host-
        # side actually consumes the values (writer, or a calibration
        # step inside this group; see _calibrate_pairs gating)
        every = max(self.conf.max_pairs_calibrate_every, 1)
        calibrate_now = self.conf.auto_max_pairs and (
            self.global_step <= 10 + k
            or (self.global_step // min(50, every))
            != ((self.global_step - k) // min(50, every)))
        if self.writer is not None or calibrate_now:
            mstack = {name: np.asarray(v) for name, v in mstack.items()}
            if self.writer is not None:
                base = self.global_step - k
                for j in range(k):
                    for name, v in mstack.items():
                        self.writer.add_scalar(f"train/{name}",
                                               float(v[j]), base + j + 1)
                self.writer.add_scalar("train/n_gaussians",
                                       int(self.model.n_active),
                                       self.global_step)
            metrics = {name: v[-1] for name, v in mstack.items()}
            # feed the calibrator the group's peak pair pressure
            metrics["pairs"] = int(np.max(mstack["pairs"]))
            metrics["overflow"] = int(np.max(mstack["overflow"]))
        else:
            # device arrays; float()-able by the caller's log cadence
            metrics = {name: v[-1] for name, v in mstack.items()}
            metrics["pairs"] = jnp.max(mstack["pairs"])
            metrics["overflow"] = jnp.max(mstack["overflow"])

        self._post_optimizer_step(skip_perturb=with_perturb,
                                  skip_events=end_events)
        self._progressive_features()
        self._calibrate_pairs(metrics, last_k=k)
        return metrics

    def run_training(self, max_steps: Optional[int] = None,
                     log_every: int = 0, group_steps: bool = True):
        n = max_steps or self.conf.n_iterations
        order = None
        t0 = time.time()
        while self.global_step < n:
            if order is None or not order:
                order = list(np.random.default_rng(
                    self.conf.seed + self.global_step).permutation(
                        len(self.dataset)))
            k = (self._plan_group(n, len(order), log_every)
                 if group_steps else 1)
            if k > 1:
                idxs = [order.pop() for _ in range(k)]
                cache = self._gt_cache()
                if cache is not False and self._frame_cams is not None \
                        and all(0 <= i < len(self._frame_cams)
                                for i in idxs):
                    metrics = self.train_group(None, idxs)
                else:
                    metrics = self.train_group(
                        [self.dataset[i] for i in idxs], idxs)
            else:
                idx = order.pop()
                cache = self._gt_cache()
                gt_dev = (cache[idx] if cache is not False
                          and 0 <= idx < cache.shape[0] else None)
                metrics = self.train_iteration(self.dataset[idx],
                                               gt_dev=gt_dev,
                                               frame_idx=idx)
            if log_every and self.global_step % log_every == 0:
                self._flush_event_stats()
                dt = time.time() - t0
                print(f"step {self.global_step}: "
                      f"loss={metrics['total']:.4f} "
                      f"psnr={metrics['psnr']:.2f} "
                      f"n={int(self.model.n_active)} "
                      f"({self.global_step / dt:.1f} it/s)")
        self._flush_event_stats()
        self.train_wall_time += time.time() - t0
        return self.metrics_history

    def _flush_event_stats(self):
        """Materialize + print strategy-event stats accumulated as device
        scalars (per-event prints would sync the pipeline every event)."""
        for step, kind, vals in self._pending_event_stats:
            flat = " ".join(f"{k}={int(v)}" for k, v in vals.items())
            print(f"[{step}] {kind}: {flat}")
        self._pending_event_stats = []

    def validate(self, dataset=None) -> Dict[str, float]:
        """Full validation pass. Metric parity with the reference
        (trainer.py:628-673, render.py:250): PSNR/SSIM always, LPIPS when
        VGG weights are present, per-ray hit statistics
        (mean/std/min/max of hits_count), and best/worst frame PSNR."""
        from ..utils import lpips as lpips_mod

        ds = dataset or self.val_dataset or self.dataset
        psnrs, ssims, lpipss = [], [], []
        hit_stats = []
        lpips_params = lpips_mod.load_weights()
        sh_degree = min(self.n_active_features, self.conf.max_n_features)
        for i in range(len(ds)):
            batch = ds[i]
            cam = camera_from_batch(batch, self.conf.ut)
            out = render_gut(cam, self.conf.ut, self._raster_cfg(),
                             self.model, sh_degree)
            pred = out["pred_features"]
            hc = out["hits_count"]
            hit_stats.append((float(jnp.mean(hc)), float(jnp.std(hc)),
                              float(jnp.min(hc)), float(jnp.max(hc))))
            if self.decoder is not None:
                from ..render.common import camera_rays_world
                _, dirs = camera_rays_world(cam)
                hh, ww = pred.shape[:2]
                pred = self.decoder(pred.reshape(-1, pred.shape[-1]),
                                    dirs.reshape(-1, 3),
                                    use_ema=True).reshape(hh, ww, 3)
            bg = bg_mod.background_color(self.conf.background, train=False)
            pred = bg_mod.apply_background(pred, out["pred_opacity"], bg)
            if self.ppisp_params is not None:
                pred = self._apply_ppisp_eval(pred, cam)
            elif self.conf.post_processing == "linear-to-srgb":
                from ..utils.misc import linear_to_srgb
                pred = linear_to_srgb(jnp.clip(pred, 0.0, 1.0))
            pred = jnp.clip(pred, 0.0, 1.0)
            # per-frame device cache for the trainer's own datasets:
            # repeated validation passes must not re-upload GT (host
            # uploads leak via the tunnel); ad-hoc datasets skip it
            if ds is self.val_dataset or ds is self.dataset:
                ck = ("val" if ds is self.val_dataset else "train", i)
                if ck not in self._val_gts_dev:
                    self._val_gts_dev[ck] = jnp.asarray(batch.rgb_gt)
                gt = self._val_gts_dev[ck]
            else:
                gt = jnp.asarray(batch.rgb_gt)
            psnrs.append(float(psnr(pred, gt)))
            ssims.append(float(ssim(pred.transpose(2, 0, 1)[None],
                                    gt.transpose(2, 0, 1)[None])))
            if lpips_params is not None:
                lpipss.append(float(lpips_mod.lpips(
                    lpips_params, pred.transpose(2, 0, 1)[None],
                    gt.transpose(2, 0, 1)[None])))
        hs = np.asarray(hit_stats)
        best = int(np.argmax(psnrs))
        worst = int(np.argmin(psnrs))
        result = {"psnr": float(np.mean(psnrs)),
                  "ssim": float(np.mean(ssims)), "n_views": len(psnrs),
                  "psnr_best": float(psnrs[best]), "best_frame": best,
                  "psnr_worst": float(psnrs[worst]), "worst_frame": worst,
                  "hits_mean": float(np.mean(hs[:, 0])),
                  "hits_std": float(np.mean(hs[:, 1])),
                  "hits_min": float(np.min(hs[:, 2])),
                  "hits_max": float(np.max(hs[:, 3]))}
        if lpipss:
            result["lpips"] = float(np.mean(lpipss))
        if self.writer is not None:
            for k in ("psnr", "ssim", "hits_mean", "hits_max"):
                self.writer.add_scalar(f"val/{k}", result[k],
                                       self.global_step)
            if "lpips" in result:
                self.writer.add_scalar("val/lpips", result["lpips"],
                                       self.global_step)
        return result

    def log_validation_images(self, batch, max_hits: float = 128.0):
        """Render one view and log gt/pred/depth/opacity/hit-count panels
        (trainer.py:668-673 equivalents; jet maps via utils.misc)."""
        from ..utils.misc import jet_map

        cam = camera_from_batch(batch, self.conf.ut)
        sh_degree = min(self.n_active_features, self.conf.max_n_features)
        out = render_gut(cam, self.conf.ut, self._raster_cfg(),
                         self.model, sh_degree)
        pred = out["pred_features"]
        if self.decoder is not None:
            from ..render.common import camera_rays_world
            _, dirs = camera_rays_world(cam)
            hh, ww = pred.shape[:2]
            pred = self.decoder(pred.reshape(-1, pred.shape[-1]),
                                dirs.reshape(-1, 3),
                                use_ema=True).reshape(hh, ww, 3)
        bg = bg_mod.background_color(self.conf.background, train=False)
        pred = jnp.clip(bg_mod.apply_background(pred, out["pred_opacity"],
                                                bg), 0, 1)
        images = {
            "pred": pred,
            "depth": jet_map(out["pred_dist"], 100.0),
            "opacity": jet_map(out["pred_opacity"], 1.0),
            "hits": jet_map(out["hits_count"], max_hits),
        }
        if batch.rgb_gt is not None:
            images["gt"] = jnp.clip(jnp.asarray(batch.rgb_gt), 0, 1)
        if self.writer is not None:
            for name, img in images.items():
                self.writer.add_image(f"val/{name}", np.asarray(img),
                                      self.global_step)
        return images

    # --- checkpointing --------------------------------------------------

    @staticmethod
    def _flatten_group(flat: dict, prefix: str, v):
        """Array groups go in directly; nested pytrees (NHT decoder flax
        dicts, ppisp param dicts) flatten with '/'-joined key paths."""
        if hasattr(v, "shape"):
            flat[prefix] = np.asarray(v)
            return
        for path, leaf in jax.tree_util.tree_flatten_with_path(v)[0]:
            ks = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                          for p in path)
            flat[f"{prefix}//{ks}"] = np.asarray(leaf)

    @staticmethod
    def _unflatten_groups(data, section: str):
        """Inverse of _flatten_group over an npz: returns {name: value}."""
        out = {}
        for k in data.files:
            if not k.startswith(section + "/"):
                continue
            rest = k[len(section) + 1:]
            if "//" in rest:
                name, keypath = rest.split("//", 1)
                d = out.setdefault(name, {})
                parts = keypath.split("/")
                for p in parts[:-1]:
                    d = d.setdefault(p, {})
                d[parts[-1]] = jnp.asarray(data[k])
            elif "/" not in rest:
                out[rest] = jnp.asarray(data[k])
        return out

    def save_checkpoint(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        flat = {}
        for name, v in self._params_dict().items():
            self._flatten_group(flat, f"params/{name}", v)
        for name, v in self.opt_state.exp_avg.items():
            self._flatten_group(flat, f"opt/m/{name}", v)
        for name, v in self.opt_state.exp_avg_sq.items():
            self._flatten_group(flat, f"opt/v/{name}", v)
        flat["opt/step"] = np.asarray(self.opt_state.step)
        flat["n_active"] = np.asarray(self.model.n_active)
        flat["global_step"] = np.asarray(self.global_step)
        flat["n_active_features"] = np.asarray(self.n_active_features)
        if self.conf.strategy == "gs":
            flat["gs/grad_accum"] = np.asarray(self.gs_buffers.grad_norm_accum)
            flat["gs/grad_denom"] = np.asarray(self.gs_buffers.grad_norm_denom)
        if self.raw_conf is not None:
            import json
            flat["config_json"] = np.asarray(json.dumps(dict(self.raw_conf)))
        np.savez(path, **flat)

    def load_checkpoint(self, path: str):
        data = np.load(path)
        params = self._unflatten_groups(data, "params")
        self._set_params_dict(params)
        self.model = self.model.replace(
            n_active=jnp.asarray(data["n_active"]))
        m = self._unflatten_groups(data, "opt/m")
        v = self._unflatten_groups(data, "opt/v")
        self.opt_state = adam_mod.AdamState(
            step=jnp.asarray(data["opt/step"]), exp_avg=m, exp_avg_sq=v)
        self.global_step = int(data["global_step"])
        self.n_active_features = int(data["n_active_features"])
        if self.conf.strategy == "gs" and "gs/grad_accum" in data:
            self.gs_buffers = gs_strategy.GSBuffers(
                jnp.asarray(data["gs/grad_accum"]),
                jnp.asarray(data["gs/grad_denom"]))

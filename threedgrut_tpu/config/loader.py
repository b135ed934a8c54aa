"""Hydra-style YAML configuration loader (no hydra dependency).

Mirrors the reference's config surface (configs/ tree with ``defaults``
composition, group overrides like ``render: 3dgut``, dotted command-line
overrides ``a.b.c=value``, and the custom resolvers ``${int_list:[...]}``
and ``${div:x,y}`` plus ``${a.b}`` interpolation) so reference-style
configs drive this trainer. Reference behavior: train.py:24-38 +
configs/base_gs.yaml.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional

import yaml


class ConfigNode(dict):
    """dict with attribute access (read/write), recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return ConfigNode({k: ConfigNode.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigNode.wrap(v) for v in obj]
        return obj


def _deep_merge(base: dict, over: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in over.items():
        if (k in out and isinstance(out[k], dict) and isinstance(v, dict)):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


_INTERP = re.compile(r"\$\{([^${}]+)\}")  # innermost interpolation


def _lookup(root: dict, dotted: str):
    cur = root
    for part in dotted.split("."):
        cur = cur[part]
    return cur


def _resolve_value(root: dict, value):
    """Resolve ${...} interpolations innermost-first (handles nesting)."""
    for _ in range(10):  # nesting depth bound
        if not isinstance(value, str):
            return value
        m = _INTERP.fullmatch(value.strip())
        if m:
            value = _resolve_expr(root, m.group(1))
            continue
        if _INTERP.search(value):
            value = _INTERP.sub(
                lambda mm: str(_resolve_expr(root, mm.group(1))), value)
            continue
        return value
    return value


def _resolve_expr(root: dict, expr: str):
    expr = expr.strip()
    if expr.startswith("int_list:"):
        inner = expr[len("int_list:"):].strip()
        vals = yaml.safe_load(inner)
        return [int(v) for v in vals]
    if expr.startswith("div:"):
        args = expr[len("div:"):].split(",")
        nums = []
        for a in args:
            a = a.strip()
            m = _INTERP.fullmatch(a)
            if m:
                nums.append(float(_resolve_expr(root, m.group(1))))
            elif a.replace(".", "", 1).replace("-", "", 1).isdigit():
                nums.append(float(a))
            else:
                nums.append(float(_resolve_value(root, _lookup(root, a))))
        return nums[0] / nums[1]
    # plain dotted reference
    v = _lookup(root, expr)
    return _resolve_value(root, v)


def _resolve_tree(root: dict, node):
    if isinstance(node, dict):
        return {k: _resolve_tree(root, v) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_tree(root, v) for v in node]
    return _resolve_value(root, node)


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _compose(config_dir: str, name: str, group: Optional[str] = None) -> dict:
    """Load <config_dir>/[group/]<name>.yaml applying its `defaults` list."""
    rel = os.path.join(group, name) if group else name
    path = os.path.join(config_dir, rel + ".yaml")
    # sibling (non-"/") defaults resolve relative to THIS file's
    # directory, hydra-style - `name` itself may carry subdirectories
    # (e.g. load_config("paper/3dgut/sorted") referencing sorted_colmap)
    sibling_group = os.path.dirname(rel) or None
    raw = _load_yaml(path)
    defaults = raw.pop("defaults", [])
    self_pos_applied = False
    merged: dict = {}
    for item in defaults:
        if item == "_self_":
            merged = _deep_merge(merged, raw)
            self_pos_applied = True
            continue
        if isinstance(item, str):
            if item.startswith("/"):
                # absolute reference from the config root (e.g. "/base")
                ref = item.lstrip("/")
                g, _, nm = ref.rpartition("/")
                sub = _compose(config_dir, nm, g or None)
            else:
                # sibling config in the same group (e.g. 3dgut: [3dgrt])
                sub = _compose(config_dir, item, sibling_group)
            merged = _deep_merge(merged, sub)
            continue
        if isinstance(item, dict):
            for key, val in item.items():
                if key.startswith("override") or val is None:
                    continue
                g = key.lstrip("/")
                if g.startswith("hydra"):
                    continue
                sub = _compose(config_dir, str(val), g)
                merged = _deep_merge(merged, {g: sub})
    if not self_pos_applied:
        merged = _deep_merge(merged, raw)
    return merged


def load_config(name: str, config_dir: Optional[str] = None,
                overrides: Optional[List[str]] = None) -> ConfigNode:
    """Compose a config by name with optional dotted overrides.

    Example: load_config("apps/nerf_synthetic_3dgut",
                         overrides=["path=data/lego", "n_iterations=100"]).
    """
    config_dir = config_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "configs")
    conf = _compose(config_dir, name)
    _apply_overrides(conf, overrides)
    conf = _resolve_tree(conf, conf)
    return ConfigNode.wrap(conf)


def _apply_overrides(conf: dict, overrides: Optional[List[str]]):
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override '{ov}' must be key=value")
        key, val = ov.split("=", 1)
        parsed = yaml.safe_load(val)
        cur = conf
        parts = key.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = parsed


def config_from_dict(d: dict, overrides: Optional[List[str]] = None
                     ) -> ConfigNode:
    """Re-instantiate a resolved config dict (e.g. the one a checkpoint
    embeds) with optional dotted overrides - the checkpoint-driven eval
    path of the reference (render.py:107: checkpoints carry the full
    resolved config and it drives re-instantiation)."""
    conf = copy.deepcopy(dict(d))
    _apply_overrides(conf, overrides)
    conf = _resolve_tree(conf, conf)
    return ConfigNode.wrap(conf)


def to_trainer_config(conf: ConfigNode):
    """Map the YAML surface onto the runtime TrainerConfig dataclasses."""
    from ..models.background import BackgroundConfig
    from ..ops.ut import UTConfig
    from ..render.common import RasterConfig
    from ..strategy.gs import GSStrategyConfig
    from ..strategy.mcmc import MCMCStrategyConfig
    from ..train.trainer import (LossConfig, OptimizerConfig, TrainerConfig)

    loss = conf.get("loss", {})
    opt = conf.get("optimizer", {})
    opt_params = opt.get("params", {})
    sched = conf.get("scheduler", {})
    model = conf.get("model", {})
    prog = model.get("progressive_training", {})
    render = conf.get("render", {})
    splat = render.get("splat", {})
    strat = conf.get("strategy", {})

    method = strat.get("method", "GSStrategy")
    strategy = "mcmc" if "MCMC" in str(method) else "gs"

    gs_cfg = GSStrategyConfig()
    mcmc_cfg = MCMCStrategyConfig()
    if strategy == "gs" and strat:
        d = strat.get("densify", {})
        p = strat.get("prune", {})
        r = strat.get("reset_density", {})
        gs_cfg = GSStrategyConfig(
            densify_frequency=d.get("frequency", 300),
            densify_start=d.get("start_iteration", 500),
            densify_end=d.get("end_iteration", 15000),
            clone_grad_threshold=d.get("clone_grad_threshold", 0.0002),
            split_grad_threshold=d.get("split_grad_threshold", 0.0002),
            relative_size_threshold=d.get("relative_size_threshold", 0.01),
            split_n_gaussians=d.get("split", {}).get("n_gaussians", 2),
            prune_frequency=p.get("frequency", 100),
            prune_start=p.get("start_iteration", 500),
            prune_end=p.get("end_iteration", 15000),
            prune_density_threshold=p.get("density_threshold", 0.005),
            reset_density_frequency=r.get("frequency", 3000),
            reset_density_start=r.get("start_iteration", 0),
            reset_density_end=r.get("end_iteration", 15000),
            new_max_density=r.get("new_max_density", 0.01),
            density_decay_frequency=strat.get("density_decay", {}).get(
                "frequency", 0),
            density_decay_start=strat.get("density_decay", {}).get(
                "start_iteration", -1),
            density_decay_end=strat.get("density_decay", {}).get(
                "end_iteration", -1),
            density_decay_gamma=strat.get("density_decay", {}).get(
                "gamma", 0.99),
            prune_scale_frequency=strat.get("prune_scale", {}).get(
                "frequency", 0),
            prune_scale_start=strat.get("prune_scale", {}).get(
                "start_iteration", -1),
            prune_scale_end=strat.get("prune_scale", {}).get(
                "end_iteration", -1),
            prune_scale_threshold=strat.get("prune_scale", {}).get(
                "threshold", 1.0),
            prune_weight_frequency=strat.get("prune_weight", {}).get(
                "frequency", 0),
            prune_weight_start=strat.get("prune_weight", {}).get(
                "start_iteration", -1),
            prune_weight_end=strat.get("prune_weight", {}).get(
                "end_iteration", -1),
            prune_weight_threshold=strat.get("prune_weight", {}).get(
                "threshold", 0.01),
            weight_telemetry_frequency=strat.get("prune_weight", {}).get(
                "telemetry_frequency", 10))
    if strategy == "mcmc" and strat:
        rl = strat.get("relocate", {})
        ad = strat.get("add", {})
        pb = strat.get("perturb", {})
        mcmc_cfg = MCMCStrategyConfig(
            binom_n_max=strat.get("binom_n_max", 51),
            opacity_threshold=strat.get("opacity_threshold", 0.005),
            relocate_frequency=rl.get("frequency", 100),
            relocate_start=rl.get("start_iteration", 500),
            relocate_end=rl.get("end_iteration", 25000),
            add_frequency=ad.get("frequency", 100),
            add_start=ad.get("start_iteration", 500),
            add_end=ad.get("end_iteration", 25000),
            max_n_gaussians=ad.get("max_n_gaussians", 1000000),
            perturb_frequency=pb.get("frequency", 1),
            perturb_start=pb.get("start_iteration", 0),
            perturb_end=pb.get("end_iteration", 27500),
            noise_lr=pb.get("noise_lr", 5e5))

    ut_cfg = UTConfig(
        alpha=splat.get("ut_alpha", 1.0),
        beta=splat.get("ut_beta", 2.0),
        kappa=splat.get("ut_kappa", 0.0),
        n_rolling_shutter_iterations=splat.get(
            "n_rolling_shutter_iterations", 5),
        image_margin_factor=splat.get("ut_in_image_margin_factor", 0.1),
        require_all_sigma_points=splat.get(
            "ut_require_all_sigma_points_valid", False),
        rect_bounding=splat.get("rect_bounding", True),
        tight_opacity_bounding=splat.get("tight_opacity_bounding", True),
        tile_based_culling=splat.get("tile_based_culling", True),
        alpha_threshold=render.get("particle_kernel_min_alpha", 1.0 / 255.0),
        global_z_order=splat.get("global_z_order", True))

    raster_cfg = RasterConfig(
        kernel_degree=render.get("particle_kernel_degree", 2),
        min_response=render.get("particle_kernel_min_response", 0.0113),
        min_alpha=render.get("particle_kernel_min_alpha", 1.0 / 255.0),
        max_alpha=render.get("particle_kernel_max_alpha", 0.99),
        min_transmittance=render.get("min_transmittance", 1e-4),
        tile_culling=splat.get("tile_based_culling", True),
        k_buffer_size=splat.get("k_buffer_size", 0),
        sorted_compositing=(splat.get("k_buffer_size", 0) > 0
                            or render.get("method") == "3dgrt"),
        sort_window=render.get("sort_window", 64),
        exact_kill=render.get("exact_kill", True),
        records_bf16=render.get("records_bf16",
                                render.get("particle_feature_half", False)),
        aligned_segments=render.get("aligned_segments", False),
        # kernel-variant knobs (default = adopted on-chip winners); kept
        # YAML-exposed so protocol runs can A/B them without code edits
        scan_mxu=render.get("scan_mxu", True),
        early_exit=render.get("early_exit", True),
        fused_mxu=render.get("fused_mxu", True),
        fused_mxu_bwd=render.get("fused_mxu_bwd", False),
        fold_wide=render.get("fold_wide", True),
        grad_bf16=render.get("grad_bf16", False),
        max_pairs=render.get("max_pairs", 1 << 20))

    bgc = model.get("background", {})
    return TrainerConfig(
        n_iterations=conf.get("n_iterations", 30000),
        strategy=strategy,
        background=BackgroundConfig(
            name=bgc.get("name", "background-color"),
            color=bgc.get("color", "black")),
        loss=LossConfig(
            use_l1=loss.get("use_l1", True),
            lambda_l1=loss.get("lambda_l1", 0.8),
            use_l2=loss.get("use_l2", False),
            lambda_l2=loss.get("lambda_l2", 1.0),
            use_ssim=loss.get("use_ssim", True),
            lambda_ssim=loss.get("lambda_ssim", 0.2),
            use_opacity=loss.get("use_opacity", False),
            lambda_opacity=loss.get("lambda_opacity", 0.0),
            use_scale=loss.get("use_scale", False),
            lambda_scale=loss.get("lambda_scale", 0.0)),
        optimizer=OptimizerConfig(
            type=opt.get("type", "adam"),
            eps=opt.get("eps", 1e-15),
            lr_positions=opt_params.get("positions", {}).get("lr", 0.00016),
            lr_density=opt_params.get("density", {}).get("lr", 0.05),
            lr_features_albedo=opt_params.get("features_albedo", {}).get(
                "lr", 0.0025),
            lr_features_specular=opt_params.get("features_specular", {}).get(
                "lr", 0.000125),
            lr_features=opt_params.get("features", {}).get("lr", 0.015),
            lr_rotation=opt_params.get("rotation", {}).get("lr", 0.001),
            lr_scale=opt_params.get("scale", {}).get("lr", 0.005),
            positions_lr_final=sched.get("positions", {}).get(
                "lr_final", 0.0000016),
            positions_max_steps=sched.get("positions", {}).get(
                "max_steps", 30000),
            features_decay_final=sched.get("features", {}).get(
                "decay_final", 0.1),
            features_max_steps=sched.get("features", {}).get(
                "max_steps", 30000),
            tail_start_frac=sched.get("tail", {}).get("start_frac", 0.66),
            tail_final_scale=sched.get("tail", {}).get("final_scale", 0.1)),
        gs=gs_cfg, mcmc=mcmc_cfg, ut=ut_cfg, raster=raster_cfg,
        # pin the pair budget (auto_max_pairs=false) for long runs on a
        # cold compile cache: every budget recalibration otherwise swaps
        # in a freshly-compiled group program (minutes each via the
        # remote compile service)
        auto_max_pairs=render.get("auto_max_pairs", True),
        init_n_features=prog.get("init_n_features", 0),
        max_n_features=prog.get("max_n_features", 3),
        increase_frequency=prog.get("increase_frequency", 1000),
        increase_step=prog.get("increase_step", 1),
        val_frequency=conf.get("val_frequency", 5000),
        seed=conf.get("seed_initialization", 42),
        nht_color_refine_steps=conf.get("model", {}).get(
            "nht_decoder", {}).get("color_refine_steps", 3000),
        nht_warmup_steps=conf.get("model", {}).get(
            "nht_decoder", {}).get("warmup_steps", 0),
        print_stats=conf.get("model", {}).get("print_stats", False),
        post_processing=conf.get("post_processing", {}).get("method"),
        ppisp_use_controller=conf.get("post_processing", {}).get(
            "use_controller", True),
        ppisp_n_distillation_steps=conf.get("post_processing", {}).get(
            "n_distillation_steps", 5000))

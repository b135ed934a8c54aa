#!/usr/bin/env python3
"""Sweep PPISP SH-bake modes on a trained checkpoint and report metrics.

TPU counterpart of the reference bake-modes benchmark
(tools/ppisp_export/bake_modes_benchmark/benchmark.py): for each mode,
bake the trained model's PPISP into its SH coefficients, then validate
per held-out frame against the reference output (full PPISP applied to
the un-baked render) and aggregate PSNR mean/median/min/max into
``<out-dir>/metrics.json``.

Modes (two axes, as in the reference):
  * ``simple``          — no optimization: fold the linear responsivity/
                          exposure scale into the coefficients
                          (usd.bake_ppisp_into_sh / scale_sh_output).
  * ``fit-training``    — photometric Adam bake on training views
                          (export/sh_bake.py).
  * ``fit-trajectory``  — photometric bake on slerped in-between poses
                          (export/view_interpolation.py).

Usage:
    python tools/ppisp_export/bake_modes_benchmark.py \
        --checkpoint runs/<scene>/ckpt_last.npz --path /data/scene \
        [--modes simple fit-training fit-trajectory] [--iters 600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--path", required=True)
    ap.add_argument("--out-dir", default="/tmp/bake_modes")
    ap.add_argument("--modes", nargs="+",
                    default=["simple", "fit-training", "fit-trajectory"])
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--n-views", type=int, default=8)
    ap.add_argument("--camera-id", type=int, default=0)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax.numpy as jnp

    from threedgrut_tpu.config.loader import (config_from_dict, load_config,
                                              to_trainer_config)
    from threedgrut_tpu.export import usd as usd_mod
    from threedgrut_tpu.export.sh_bake import bake_ppisp
    from threedgrut_tpu.models.post_processing import apply_ppisp
    from threedgrut_tpu.ops.ssim import psnr
    from threedgrut_tpu.render.gut import render_gut
    from threedgrut_tpu.train.trainer import Trainer, camera_from_batch
    from train import make_dataset, make_model

    overrides = [f"path={args.path}"] + args.overrides
    data = np.load(args.checkpoint)
    if "config_json" in data.files:
        conf = config_from_dict(json.loads(str(data["config_json"])),
                                overrides=overrides)
    else:
        conf = load_config("apps/nerf_synthetic_3dgut", overrides=overrides)
    tconf = to_trainer_config(conf)
    train_ds = make_dataset(conf, "train")
    try:
        val_ds = make_dataset(conf, "val" if conf.dataset.type == "nerf"
                              else "test")
    except Exception:
        val_ds = train_ds
    model = make_model(conf, train_ds)
    trainer = Trainer(tconf, train_ds, model, val_dataset=val_ds)
    trainer.load_checkpoint(args.checkpoint)
    model = trainer.model
    ppisp = trainer.ppisp_params
    if ppisp is None:
        sys.exit("checkpoint has no PPISP parameters")
    sh_degree = min(trainer.n_active_features, tconf.max_n_features)
    rc = trainer._raster_cfg()

    def validate(baked_model, tag):
        """Per-frame PSNR of baked render vs PPISP'd reference render."""
        rows = []
        for i in range(len(val_ds)):
            batch = val_ds[i]
            cam = camera_from_batch(batch, tconf.ut)
            ref = render_gut(cam, tconf.ut, rc, model,
                             sh_degree)["pred_features"]
            # novel view: per-frame params unknown -> neutral frame 0
            ref = jnp.clip(apply_ppisp(ppisp, ref, args.camera_id, 0),
                           0.0, 1.0)
            baked = jnp.clip(render_gut(cam, tconf.ut, rc, baked_model,
                                        sh_degree)["pred_features"],
                             0.0, 1.0)
            rows.append(float(psnr(baked, ref)))
        arr = np.asarray(rows)
        return {"mode": tag, "psnr_mean": float(arr.mean()),
                "psnr_median": float(np.median(arr)),
                "psnr_min": float(arr.min()), "psnr_max": float(arr.max()),
                "per_frame": rows}

    results = []
    for mode in args.modes:
        t0 = time.time()
        if mode == "simple":
            alb = np.asarray(model.params.features_albedo)
            n, d3 = alb.shape
            spec = np.asarray(model.params.features_specular)
            ks = spec.shape[1] // 3 + 1
            sh = np.concatenate([alb.reshape(n, 1, 3),
                                 spec.reshape(n, ks - 1, 3)], axis=1)
            baked_sh = usd_mod.bake_ppisp_into_sh(sh, ppisp,
                                                  camera_idx=args.camera_id)
            new_alb = jnp.asarray(baked_sh[:, 0, :])
            new_spec = jnp.asarray(baked_sh[:, 1:, :].reshape(n, -1))
        else:
            sampling = ("trajectory" if mode == "fit-trajectory"
                        else "training")
            out = bake_ppisp(model, ppisp, train_ds, tconf.ut, rc,
                             sh_degree, iters=args.iters,
                             view_sampling=sampling,
                             n_views=args.n_views)
            new_alb = out["features_albedo"]
            new_spec = out["features_specular"]
        baked_model = model.replace(params=model.params.replace(
            features_albedo=new_alb, features_specular=new_spec))
        row = validate(baked_model, mode)
        row["bake_time_s"] = round(time.time() - t0, 2)
        print(json.dumps({k: v for k, v in row.items()
                          if k != "per_frame"}))
        results.append(row)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out_dir}/metrics.json")


if __name__ == "__main__":
    main()

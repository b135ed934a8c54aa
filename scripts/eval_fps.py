#!/usr/bin/env python
"""Scene-calibrated eval-FPS benchmark (the deployment render path).

Why this exists: every pair-stage cost in the 3DGUT pipeline (interval
expand, tile sort, record gather, raster chunk count) scales with the
STATIC pair budget `render.max_pairs`, not with the live pair count.
During training the budget is auto-calibrated upward for the worst view
of a growing cloud (train/trainer.py _calibrate_pairs); a frozen
checkpoint rendered for eval/serving needs far less. The reference's
CUDA renderer sizes its buffers from a per-frame prefix sum
(threedgut_tracer renderer host: count -> scan -> sort per frame), so
its eval cost scales with live pairs automatically; on TPU shapes must
be static, so we recover the same property at *deployment* granularity:
probe the scene once over an orbit of views, size the budget to the
worst probe view plus a margin, compile one program at that budget.

Usage:
  python scripts/eval_fps.py --checkpoint runs/conv_gs_r3/ckpt_30000.npz
Prints per-budget timings plus one JSON line for the record.
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.getcwd(), ".jax_cache"))

import numpy as np

# Budget granularity: multiple of the expand slab (8192) and therefore
# of the raster CHUNK (128).
SLAB = 8192


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="runs/conv_gs_r3/ckpt_30000.npz")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--frames", type=int, default=40,
                    help="timed frames per budget")
    ap.add_argument("--probe-views", type=int, default=8,
                    help="orbit views sampled for calibration")
    ap.add_argument("--margin", type=float, default=1.3,
                    help="headroom over the worst probe view")
    ap.add_argument("--train-budget", type=int, default=96 * SLAB,
                    help="training-default budget to compare against")
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8,
                    help="views per dispatch for the batched serving path")
    ap.add_argument("--mxu-mode", default="emu",
                    choices=("emu", "fp32", "bf16"),
                    help="MXU contraction mode (ops/pallas/mxu.py); bf16 "
                         "is the fast-serving 1-pass mode — pair with "
                         "--save-frame and compare against an emu run")
    ap.add_argument("--budget", type=int, default=0,
                    help="pin the calibrated budget (skips the probe "
                         "pass — for A/B reruns against a prior "
                         "calibration)")
    ap.add_argument("--save-frame", default="",
                    help="save the first batched-serve frame to this "
                         ".npz for cross-process quality comparison")
    args = ap.parse_args()
    os.environ["THREEDGRUT_MXU_F32MODE"] = args.mxu_mode

    import jax
    import jax.numpy as jnp

    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 state_from_checkpoint)
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.playground.web_gui import orbit_camera
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut

    if not os.path.exists(args.checkpoint):
        print(f"no checkpoint at {args.checkpoint}; nothing to measure")
        return 0
    model = state_from_checkpoint(args.checkpoint, GaussianModelConfig())
    n = int(model.n_active)

    # Orbit geometry from the live cloud (robust radius: 95th pct).
    pos = np.asarray(model.params.positions)[:n]
    center = pos.mean(axis=0)
    radius = float(np.percentile(np.linalg.norm(pos - center, axis=1), 95))
    dist = max(2.2 * radius, 1e-3)
    res = (args.width, args.height)
    cams = [orbit_camera(az, 0.35, dist, center=center, resolution=res)
            for az in np.linspace(0.0, 2 * math.pi, args.probe_views,
                                  endpoint=False)]

    def make_render(budget):
        # published-metrics semantics: exact kill, f32 records
        rc = RasterConfig(max_pairs=budget, exact_kill=True,
                          records_bf16=False)

        @jax.jit
        def render(cam):
            out = render_gut(cam, UTConfig(), rc, model,
                             sh_degree=args.sh_degree)
            return out["pred_features"], out["num_pairs"], \
                out["pairs_overflow"]

        return render

    def time_render(render, budget, label):
        img, pairs, ovf = render(cams[0])
        jax.block_until_ready(img)
        t0 = time.time()
        for i in range(args.frames):
            img, _, _ = render(cams[i % len(cams)])
        jax.block_until_ready(img)
        dt = (time.time() - t0) / args.frames
        print(f"  {label}: budget={budget} -> {dt * 1e3:.2f} ms = "
              f"{1 / dt:.1f} FPS")
        return dt

    if args.budget > 0:
        # pinned budget: skip the probe AND the per-budget single-frame
        # timings (an A/B rerun only needs the batched-serve number)
        budget = args.budget
        print(f"checkpoint {args.checkpoint}: n={n}, orbit "
              f"dist={dist:.2f}, pinned budget {budget}, "
              f"mxu_mode={args.mxu_mode}")
        dt_train = dt_cal = float("nan")
    else:
        # --- calibration probe (the training-budget program doubles as
        # the comparison measurement, so the probe costs nothing extra)
        probe = make_render(args.train_budget)
        totals = []
        for cam in cams:
            _, pairs, ovf = probe(cam)
            totals.append(int(pairs) + int(ovf))  # == exact pre-drop total
        worst = max(totals)
        budget = max(SLAB,
                     int(math.ceil(worst * args.margin / SLAB)) * SLAB)
        print(f"checkpoint {args.checkpoint}: n={n}, orbit dist={dist:.2f}")
        print(f"probe pair totals over {len(cams)} views: "
              f"min={min(totals)} max={worst} -> calibrated budget "
              f"{budget} ({budget / args.train_budget:.0%} of training "
              f"budget)")

        dt_train = time_render(probe, args.train_budget, "training budget")
        if budget >= args.train_budget:
            print("calibrated budget >= training budget; nothing to gain")
            dt_cal = dt_train
        else:
            dt_cal = time_render(make_render(budget), budget,
                                 "calibrated budget")

    # --- batched fwd-only serving path (render/serve.py): B views per
    # dispatch, training-only machinery dropped at trace time ---
    from threedgrut_tpu.render.serve import (make_serving_renderer,
                                             stack_cameras)
    rc = RasterConfig(max_pairs=budget, exact_kill=True,
                      records_bf16=False)
    serve = make_serving_renderer(model, rc, args.sh_degree)
    bsz = args.batch
    orbit = [orbit_camera(az, 0.35, dist, center=center, resolution=res)
             for az in np.linspace(0.0, 2 * math.pi, bsz, endpoint=False)]
    cams_b = stack_cameras(orbit)
    imgs = serve(cams_b)
    jax.block_until_ready(imgs)
    reps = max(1, args.frames // bsz)
    t0 = time.time()
    for _ in range(reps):
        imgs = serve(cams_b)
    jax.block_until_ready(imgs)
    dt_serve = (time.time() - t0) / (reps * bsz)
    print(f"  serving batch={bsz}: budget={budget} -> "
          f"{dt_serve * 1e3:.2f} ms/frame = {1 / dt_serve:.1f} FPS")

    if args.save_frame:
        np.savez_compressed(args.save_frame,
                            frame=np.asarray(imgs[0]),
                            mode=args.mxu_mode, budget=budget)
        print(f"  saved first serve frame -> {args.save_frame}")

    print(json.dumps({
        "metric": f"3dgut_eval_fps_{args.width}px_calibrated",
        "value": round(1 / dt_serve, 2), "unit": "FPS",
        "n_particles": n, "budget": budget, "batch": bsz,
        "mxu_mode": args.mxu_mode,
        "fps_single_frame_calibrated":
            None if math.isnan(dt_cal) else round(1 / dt_cal, 2),
        "fps_at_training_budget":
            None if math.isnan(dt_train) else round(1 / dt_train, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

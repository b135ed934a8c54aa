"""3DGRT sort-window quality A/B on the synthetic scene.

Trains the apps/nerf_synthetic_3dgrt config (sorted compositing, kernel
degree 4) twice with different sort windows and reports held-out PSNR -
the quality evidence required to adopt a narrower (faster) window
(reference anchor: 16-deep k-buffer, pipelineParameters.h:83).

Run: python tests/tpu_grt_ab.py [iters] [windowA] [windowB]
"""
import json
import os
import subprocess
import sys

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
WINDOWS = [int(a) for a in sys.argv[2:]] or [64, 32]


def run(window):
    out_dir = f"/tmp/grt_ab_w{window}"
    subprocess.run(["rm", "-rf", out_dir], check=True)
    cmd = [
        "python", "/root/repo/train.py",
        "--config-name", "apps/nerf_synthetic_3dgrt",
        "path=/root/repo/.data/synth_lego",
        f"n_iterations={ITERS}",
        "val_frequency=100000", "enable_writer=false",
        "initialization.num_gaussians=30000",
        f"out_dir={out_dir}", "experiment_name=ab",
        "model.print_stats=false", "log_frequency=5",
        f"render.sort_window={window}",
    ]
    p = subprocess.run(cmd, capture_output=True, text=True,
                       cwd="/root/repo", timeout=7200)
    final = None
    for line in p.stdout.splitlines():
        if line.startswith("final:"):
            final = line
    print(f"--- window={window} rc={p.returncode}")
    print(p.stdout.splitlines()[-5:] if final is None else final)
    if p.returncode != 0:
        print(p.stderr[-2000:])
    fm = os.path.join(out_dir, "ab", "final_metrics.json")
    if os.path.exists(fm):
        with open(fm) as f:
            return json.load(f)
    return None


results = {}
for w in WINDOWS:
    results[w] = run(w)
print(json.dumps({str(w): (None if r is None else
                           {"psnr": r.get("psnr"), "ssim": r.get("ssim"),
                            "train_time_s": r.get("train_time_s")})
                  for w, r in results.items()}, indent=1))

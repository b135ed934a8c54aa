#!/bin/bash
# MipNeRF360 NHT validation suite (reference
# scripts/benchmark/mipnerf360_nht.sh): MCMC + Neural-Harmonic-Texture
# features, per-scene particle caps, train + render + summary table.
#   mipnerf360_nht.sh [apps/colmap_3dgut_mcmc_nht] [overrides...]
set -euo pipefail
CONFIG=${CONFIG:-"apps/colmap_3dgut_mcmc_nht"}
if [[ $# -gt 0 && "$1" != *=* ]]; then CONFIG="$1"; shift; fi
DATA_ROOT=${DATA_ROOT:-"data/mipnerf360"}
RESULT_DIR=${RESULT_DIR:-"results/mipnerf360_nht"}
CAP_MAX=${CAP_MAX:-1000000}
MAX_STEPS=${MAX_STEPS:-30000}
FEATURE_DIM=${FEATURE_DIM:-64}
SCENES=${SCENES:-"bonsai counter kitchen room garden bicycle stump treehill flowers"}
RUN_TRAIN=${RUN_TRAIN:-1}
RUN_RENDER=${RUN_RENDER:-1}
HERE="$(dirname "$0")"
ROOT="$(cd "$HERE/../.." && pwd)"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$ROOT/.jax_cache}"
mkdir -p "$RESULT_DIR"
for SCENE in $SCENES; do
    case "$SCENE" in
        bonsai|counter|kitchen|room) DATA_FACTOR=2 ;;
        *) DATA_FACTOR=4 ;;
    esac
    if [[ "$RUN_TRAIN" == "1" ]]; then
        echo "Training: $SCENE (factor=$DATA_FACTOR, cap=$CAP_MAX, nht=$FEATURE_DIM)"
        python "$ROOT/train.py" --config-name "$CONFIG" \
            enable_writer=false out_dir="$RESULT_DIR" \
            path="$DATA_ROOT/$SCENE" experiment_name="$SCENE" \
            dataset.downsample_factor="$DATA_FACTOR" \
            n_iterations="$MAX_STEPS" \
            strategy.add.max_n_gaussians="$CAP_MAX" \
            model.nht_features.dim="$FEATURE_DIM" \
            scheduler.positions.max_steps="$MAX_STEPS" \
            scheduler.features.max_steps="$MAX_STEPS" \
            "$@" > "$RESULT_DIR/train_$SCENE.log" 2>&1
    fi
    if [[ "$RUN_RENDER" == "1" && -f "$RESULT_DIR/$SCENE/ckpt_last.npz" ]]; then
        python "$ROOT/render.py" \
            --checkpoint "$RESULT_DIR/$SCENE/ckpt_last.npz" \
            --path "$DATA_ROOT/$SCENE" \
            --out-dir "$RESULT_DIR/eval_$SCENE" \
            > "$RESULT_DIR/render_$SCENE.log" 2>&1
    fi
done
# summary table from the per-scene metrics.json files
RESULT_DIR="$RESULT_DIR" SCENES="$SCENES" python - <<'PY'
import glob, json, os
rd, scenes = os.environ["RESULT_DIR"], os.environ["SCENES"].split()
rows = []
for s in scenes:
    paths = glob.glob(os.path.join(rd, f"eval_{s}", "**", "metrics.json"),
                      recursive=True)
    if paths:
        with open(max(paths, key=os.path.getmtime)) as f:
            rows.append((s, json.load(f)))
print("| Scene | PSNR | SSIM | LPIPS |")
print("|---|---:|---:|---:|")
for s, m in rows:
    print(f"| {s} | {m.get('mean_psnr', float('nan')):.3f} | "
          f"{m.get('mean_ssim', float('nan')):.4f} | "
          f"{(m.get('mean_lpips') or float('nan')):.4f} |")
PY

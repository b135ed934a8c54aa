#!/bin/bash
# Shared scene-loop driver for the benchmark suites (TPU equivalent of
# the reference's per-dataset scripts, reference
# scripts/benchmark/nerf_synthetic.sh / mipnerf360.sh structure).
#
# Usage:  run_suite.sh <config-yaml> <data-root> <result-dir> \
#             "<scene list>" [extra overrides...]
#
# Trains every scene with train.py (one TPU process at a time — the
# compile service is single-tenant), writing train_<scene>.log and the
# trainer's final_metrics.json per scene. Set RENDER_ONLY=1 to instead
# eval existing checkpoints with render.py (the *_render.sh wrappers).
set -e

CONFIG=$1
DATA_ROOT=$2
RESULT_DIR=$3
SCENE_LIST=$4
EXTRA_ARGS=${@:5}

if [[ -z $CONFIG || -z $DATA_ROOT || -z $RESULT_DIR || -z $SCENE_LIST ]]; then
    echo "Usage: $0 <config-yaml> <data-root> <result-dir> \"<scenes>\" [overrides...]"
    exit 1
fi

ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$ROOT/.jax_cache}"

if [[ -z $RENDER_ONLY && -z $SKIP_EXISTS_CHECK && -d "$RESULT_DIR" ]]; then
    echo "Result directory $RESULT_DIR already exists. Aborting execution."
    exit 1
fi
mkdir -p "$RESULT_DIR"

for SCENE in $SCENE_LIST; do
    if [[ -n $RENDER_ONLY ]]; then
        echo "Rendering: $SCENE"
        python "$ROOT/render.py" \
            --checkpoint "$RESULT_DIR/$SCENE/ckpt_last.npz" \
            --path "$DATA_ROOT/$SCENE" \
            --out-dir "$RESULT_DIR/eval_$SCENE" \
            > "$RESULT_DIR/render_$SCENE.log" 2>&1
    else
        echo "Training: $SCENE  (config: $CONFIG)"
        python "$ROOT/train.py" --config-name "$CONFIG" \
            enable_writer=false \
            out_dir="$RESULT_DIR" path="$DATA_ROOT/$SCENE" \
            experiment_name="$SCENE" $EXTRA_ARGS \
            > "$RESULT_DIR/train_$SCENE.log" 2>&1
    fi
done

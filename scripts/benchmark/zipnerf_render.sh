#!/bin/bash
# Eval checkpoints produced by zipnerf.sh with render.py (reference
# scripts/benchmark/zipnerf_render.sh). Optional second arg renders the
# fisheye-trained / undistorted-trained models against another capture
# variant's data (cross-eval, as the reference does).
set -e
RESULT_DIR=${1:?Usage: $0 <result-dir> [data-path]}
DATA_PATH=$2
SCENES=${SCENES:-"alameda berlin london nyc"}
HERE="$(dirname "$0")"
for VARIANT in fisheye undistorted; do
    SCENE_DIRS=""
    for S in $SCENES; do SCENE_DIRS="$SCENE_DIRS $VARIANT/$S"; done
    if [[ -z $DATA_PATH ]]; then
        RENDER_ONLY=1 RESULT_DIR="$RESULT_DIR" "$HERE/run_suite.sh" "-" \
            "${DATA_ROOT:-data/zipnerf}" "$RESULT_DIR" "$SCENE_DIRS"
    else
        RENDER_ONLY=1 RESULT_DIR="$RESULT_DIR" DATA_OVERRIDE="$DATA_PATH" \
            "$HERE/run_suite.sh" "-" "$DATA_PATH" "$RESULT_DIR" "$SCENE_DIRS"
    fi
done

#!/bin/bash
# Eval checkpoints produced by nerf_synthetic.sh with render.py
# (reference scripts/benchmark/nerf_synthetic_render.sh).
set -e
DATA_ROOT=${DATA_ROOT:-"data/nerf_synthetic"}
RESULT_DIR=${RESULT_DIR:-"results/nerf_synthetic"}
SCENES=${SCENES:-"chair drums ficus hotdog lego materials mic ship"}
RENDER_ONLY=1 exec "$(dirname "$0")/run_suite.sh" "-" "$DATA_ROOT" \
    "$RESULT_DIR" "$SCENES"

#!/bin/bash
# Eval checkpoints produced by mipnerf360.sh with render.py (reference
# scripts/benchmark/mipnerf360_render.sh).
set -e
RESULT_DIR=${1:-"results/mipnerf360"}
DATA_ROOT=${DATA_ROOT:-"data/mipnerf360"}
SCENES=${SCENES:-"bicycle bonsai counter flowers garden kitchen room stump treehill"}
RENDER_ONLY=1 exec "$(dirname "$0")/run_suite.sh" "-" "$DATA_ROOT" \
    "$RESULT_DIR" "$SCENES"

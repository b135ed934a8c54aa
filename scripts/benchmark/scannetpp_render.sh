#!/bin/bash
# Eval checkpoints produced by scannetpp.sh with render.py (reference
# scripts/benchmark/scannetpp_render.sh; same six-scene protocol).
set -e
RESULT_DIR=${1:-"results/scannetpp"}
DATA_ROOT=${DATA_ROOT:-"data/scannetpp"}
SCENES=${SCENES:-"0a5c013435 8d563fc2cc bb87c292ad d415cc449b e8ea9b4da8 fe1733741f"}
RENDER_ONLY=1 exec "$(dirname "$0")/run_suite.sh" "-" "$DATA_ROOT" \
    "$RESULT_DIR" "$SCENES"

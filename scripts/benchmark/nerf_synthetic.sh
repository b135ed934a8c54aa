#!/bin/bash
# NeRF-synthetic training suite (reference scripts/benchmark/nerf_synthetic.sh).
#   nerf_synthetic.sh apps/nerf_synthetic_3dgut [overrides...]
set -e
CONFIG=${1:?Usage: $0 <config-yaml> [overrides...]}
DATA_ROOT=${DATA_ROOT:-"data/nerf_synthetic"}
RESULT_DIR=${RESULT_DIR:-"results/nerf_synthetic"}
SCENES=${SCENES:-"chair drums ficus hotdog lego materials mic ship"}
exec "$(dirname "$0")/run_suite.sh" "$CONFIG" "$DATA_ROOT" "$RESULT_DIR" \
    "$SCENES" "${@:2}"

#!/bin/bash
# MipNeRF360 training suite (reference scripts/benchmark/mipnerf360.sh).
# Reference protocol: COLMAP dataset, downsample 2 (indoor) / 4 (outdoor).
#   mipnerf360.sh apps/colmap_3dgut [overrides...]
set -e
CONFIG=${1:?Usage: $0 <config-yaml> [overrides...]}
DATA_ROOT=${DATA_ROOT:-"data/mipnerf360"}
RESULT_DIR=${RESULT_DIR:-"results/mipnerf360"}
OUTDOOR=${OUTDOOR:-"bicycle flowers garden stump treehill"}
INDOOR=${INDOOR:-"bonsai counter kitchen room"}
HERE="$(dirname "$0")"
RESULT_DIR="$RESULT_DIR" "$HERE/run_suite.sh" "$CONFIG" "$DATA_ROOT" \
    "$RESULT_DIR" "$OUTDOOR" dataset.downsample_factor=4 "${@:2}"
RESULT_DIR="$RESULT_DIR" SKIP_EXISTS_CHECK=1 "$HERE/run_suite.sh" \
    "$CONFIG" "$DATA_ROOT" "$RESULT_DIR" "$INDOOR" \
    dataset.downsample_factor=2 "${@:2}"

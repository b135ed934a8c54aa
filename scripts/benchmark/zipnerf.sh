#!/bin/bash
# ZipNeRF training suite (reference scripts/benchmark/zipnerf.sh): each
# scene trains twice — on the fisheye captures and on the undistorted
# ones — at downsample factor 8.
#   zipnerf.sh apps/colmap_3dgut [overrides...]
set -e
CONFIG=${1:?Usage: $0 <config-yaml> [overrides...]}
DATA_ROOT=${DATA_ROOT:-"data/zipnerf"}
RESULT_DIR=${RESULT_DIR:-"results/zipnerf"}
SCENES=${SCENES:-"alameda berlin london nyc"}
HERE="$(dirname "$0")"

for VARIANT in fisheye undistorted; do
    SCENE_DIRS=""
    for S in $SCENES; do SCENE_DIRS="$SCENE_DIRS $VARIANT/$S"; done
    RESULT_DIR="$RESULT_DIR" SKIP_EXISTS_CHECK=1 "$HERE/run_suite.sh" \
        "$CONFIG" "$DATA_ROOT" "$RESULT_DIR" "$SCENE_DIRS" \
        dataset.downsample_factor=8 "${@:2}"
done

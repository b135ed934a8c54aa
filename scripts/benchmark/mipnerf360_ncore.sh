#!/bin/bash
# MipNeRF360 via the NCore v4 dataset packaging (reference
# scripts/benchmark/mipnerf360_ncore.sh: same scenes, data served from
# <scene>/<scene>.json NCore manifests with per-factor camera ids).
#   mipnerf360_ncore.sh apps/ncore_3dgut_mcmc [overrides...]
set -e
CONFIG=${1:?Usage: $0 <config-yaml> [overrides...]}
DATA_ROOT=${DATA_ROOT:-"data/colmap_ncore_v4"}
RESULT_DIR=${RESULT_DIR:-"results/colmap_ncore_v4"}
HERE="$(dirname "$0")"
ROOT="$(cd "$HERE/../.." && pwd)"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$ROOT/.jax_cache}"
if [[ -z $SKIP_EXISTS_CHECK && -d "$RESULT_DIR" ]]; then
    echo "Result directory $RESULT_DIR already exists. Aborting execution."
    exit 1
fi
mkdir -p "$RESULT_DIR"
for SCENE in ${SCENES:-"bicycle bonsai counter flowers garden kitchen room stump treehill"}; do
    case "$SCENE" in
        bonsai|counter|kitchen|room) DATA_FACTOR=2 ;;
        *) DATA_FACTOR=4 ;;
    esac
    echo "Training: $SCENE (NCore manifest, camera1_$DATA_FACTOR)"
    python "$ROOT/train.py" --config-name "$CONFIG" \
        enable_writer=false out_dir="$RESULT_DIR" \
        path="$DATA_ROOT/$SCENE/$SCENE.json" experiment_name="$SCENE" \
        "dataset.camera_ids=[camera1_$DATA_FACTOR]" "${@:2}" \
        > "$RESULT_DIR/train_$SCENE.log" 2>&1
done

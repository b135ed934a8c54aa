#!/bin/bash
# ScanNet++ training suite (reference scripts/benchmark/scannetpp.sh).
#   scannetpp.sh apps/scannetpp_3dgut [overrides...]
set -e
CONFIG=${1:?Usage: $0 <config-yaml> [overrides...]}
DATA_ROOT=${DATA_ROOT:-"data/scannetpp"}
RESULT_DIR=${RESULT_DIR:-"results/scannetpp"}
SCENES=${SCENES:-"0a5c013435 8d563fc2cc bb87c292ad d415cc449b e8ea9b4da8 fe1733741f"}
exec "$(dirname "$0")/run_suite.sh" "$CONFIG" "$DATA_ROOT" "$RESULT_DIR" \
    "$SCENES" "${@:2}"

#!/usr/bin/env bash
# One-command test runner (VERDICT r2 item 9; reference analogue:
# /root/reference/.github/workflows/ci.yaml which runs format check +
# the export suite). Everything here is CPU-only: the conftest pins
# jax to an 8-device virtual CPU mesh, so this runs anywhere.
#
#   scripts/run_tests.sh            # fast suite (~7 min, 1 CPU)
#   scripts/run_tests.sh --full     # full suite incl. slow
#                                   # interpret-mode tests (~40+ min)
#   scripts/run_tests.sh --smoke    # CLI --help smoke checks only
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-fast}"

smoke() {
    # mirrors the reference CI's "smoke-test train.py --help"
    python train.py --help >/dev/null
    python render.py --help >/dev/null
    python playground.py --help >/dev/null
    python validate.py --help >/dev/null
    echo "CLI smoke: OK"
}

case "$MODE" in
    --smoke) smoke ;;
    --full)
        smoke
        python -m pytest tests/ -q --ignore-glob='tests/tpu_*' ;;
    fast|--fast)
        smoke
        python -m pytest tests/ -q -m 'not slow' --ignore-glob='tests/tpu_*' ;;
    *) echo "usage: $0 [--fast|--full|--smoke]" >&2; exit 2 ;;
esac

#!/bin/bash
# 3DGRT sorted-path lever battery (VERDICT r2 item 3).
# One TPU process at a time; each config is a fresh process because
# THREEDGRUT_CHUNK / GRT_* are read at import.
# Usage: bash scripts/grt_battery.sh [logfile]
set -u
LOG=${1:-/tmp/grt_battery.log}
cd /root/repo
run() {
  echo "=== $* ===" | tee -a "$LOG"
  env "$@" timeout 3000 python tests/tpu_bench_grt.py 2>&1 \
    | grep -v WARNING | tee -a "$LOG"
}
# round-5 A/B: all-dead chunk-visit skip (exact semantics) on vs off at
# the adopted round-3 config (W=16 bf16 nokill, CHUNK=128)
run GRT_SORT_WINDOW=16 GRT_RECORDS_BF16=1 GRT_EXACT_KILL=0 THREEDGRUT_CHUNK=128 GRT_SKIP_DEAD=1
run GRT_SORT_WINDOW=16 GRT_RECORDS_BF16=1 GRT_EXACT_KILL=0 THREEDGRUT_CHUNK=128 GRT_SKIP_DEAD=0
echo "battery done" | tee -a "$LOG"

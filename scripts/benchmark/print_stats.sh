#!/bin/bash
# Aggregate per-scene stats from a benchmark result directory
# (reference scripts/benchmark/print_stats.sh — ours reads the
# machine-readable final_metrics.json instead of grepping logs).
#   print_stats.sh [result-dir]
RESULT_DIR=${1:-.}
python3 - "$RESULT_DIR" <<'EOF'
import glob, json, os, sys

root = sys.argv[1]
rows = []
for p in sorted(glob.glob(os.path.join(root, "*", "final_metrics.json"))):
    with open(p) as f:
        m = json.load(f)
    rows.append((os.path.basename(os.path.dirname(p)), m))
if not rows:
    sys.exit(f"no final_metrics.json under {root}")
cols = ["psnr", "ssim", "lpips", "train_time_s", "n_gaussians"]
hdr = ["scene"] + cols
print(" | ".join(f"{h:>12}" for h in hdr))
acc = {c: [] for c in cols}
for name, m in rows:
    vals = []
    for c in cols:
        v = m.get(c)
        vals.append("-" if v is None else f"{v:.3f}" if isinstance(v, float) else str(v))
        if isinstance(v, (int, float)):
            acc[c].append(v)
    print(" | ".join(f"{x:>12}" for x in [name] + vals))
mean = ["mean"] + [f"{sum(a)/len(a):.3f}" if a else "-" for a in (acc[c] for c in cols)]
print(" | ".join(f"{x:>12}" for x in mean))
EOF

"""Summarize a train.py convergence log into a markdown table.

Parses `val:` lines (trainer.validate() dicts) and step-rate lines from
a runs/*.log file and prints:
- the iter/PSNR/SSIM table (NOTES.md convergence-benchmark format),
- per-window wall rates (the in-log `it/s` figure is cumulative-step /
  window-time, so the real window rate is window_steps / dt where
  dt = global_step / printed_rate).

Usage: python scripts/conv_table.py runs/conv_gs_r3.log
"""

import re
import sys


def main(path):
    val_re = re.compile(r"val: \{(.*)\}")
    step_re = re.compile(
        r"step (\d+): loss=([\d.]+) psnr=([\d.]+) n=(\d+) "
        r"\(([\d.]+) it/s\)")
    vals = []
    rates = []
    last_step = None
    for line in open(path):
        m = step_re.search(line)
        if m:
            step, _, _, n, printed = (int(m.group(1)), m.group(2),
                                      m.group(3), int(m.group(4)),
                                      float(m.group(5)))
            dt = step / printed if printed > 0 else 0.0
            if last_step is not None and dt > 0:
                rates.append((step, (step - last_step) / dt, n))
            last_step = step
        m = val_re.search(line)
        if m and last_step is not None:
            d = {}
            for kv in m.group(1).split(", "):
                if ": " in kv:
                    k, v = kv.split(": ", 1)
                    k = k.strip("'\"")
                    try:
                        d[k] = float(v)
                    except ValueError:
                        pass
            vals.append((last_step, d))

    print("| iter | val PSNR | val SSIM | n | window it/s |")
    print("|---|---|---|---|---|")
    rate_at = dict((s, (r, n)) for s, r, n in rates)
    for step, d in vals:
        r, n = rate_at.get(step, (float("nan"), 0))
        print(f"| {step} | {d.get('psnr', float('nan')):.2f} "
              f"| {d.get('ssim', float('nan')):.3f} | {n} | {r:.1f} |")
    if rates:
        import statistics
        rs = [r for _, r, _ in rates]
        print(f"\nwindow rates: median {statistics.median(rs):.1f} it/s, "
              f"min {min(rs):.1f}, max {max(rs):.1f} over {len(rs)} windows")


if __name__ == "__main__":
    main(sys.argv[1])

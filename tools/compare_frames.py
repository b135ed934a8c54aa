#!/usr/bin/env python
"""Compare two saved serve frames (scripts/eval_fps.py --save-frame).

Usage: python tools/compare_frames.py a.npz b.npz
Prints PSNR between the frames — the quality cost of a serving-mode
knob (e.g. --mxu-mode bf16 vs emu on the same pinned budget/views).
"""
import sys

import numpy as np


def main():
    a = np.load(sys.argv[1])
    b = np.load(sys.argv[2])
    fa, fb = a["frame"].astype(np.float64), b["frame"].astype(np.float64)
    assert fa.shape == fb.shape, (fa.shape, fb.shape)
    mse = float(np.mean((fa - fb) ** 2))
    psnr = float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)
    print(f"{a['mode']} vs {b['mode']}: mse={mse:.3e} psnr={psnr:.2f} dB "
          f"max|d|={float(np.abs(fa - fb).max()):.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

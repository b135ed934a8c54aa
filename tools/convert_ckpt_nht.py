#!/usr/bin/env python
"""Graft a trained SH checkpoint's geometry into a fresh NHT model.

Produces an init-compatible .npz (models/gaussians.state_from_checkpoint)
carrying the source checkpoint's positions/rotation/scale/density and
NEW random NHT latents (uniform in [init_min, init_max] per
configs/base.yaml nht_features), dropping the SH feature banks. Use
with `initialization/checkpoint` + a *_nht app config to train the NHT
texture field on frozen or free geometry.

Usage:
  python tools/convert_ckpt_nht.py src.npz dst.npz [--dim 48]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--dim", type=int, default=48)
    ap.add_argument("--init-min", type=float, default=-np.pi / 2)
    ap.add_argument("--init-max", type=float, default=np.pi / 2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    src = np.load(args.src, allow_pickle=True)
    cap = src["params/positions"].shape[0]
    rng = np.random.default_rng(args.seed)
    out = {
        "params/positions": src["params/positions"],
        "params/rotation": src["params/rotation"],
        "params/scale": src["params/scale"],
        "params/density": src["params/density"],
        "params/features": rng.uniform(
            args.init_min, args.init_max,
            (cap, args.dim)).astype(np.float32),
        "n_active": src["n_active"],
        "global_step": np.asarray(0),
        "n_active_features": src["n_active_features"],
    }
    np.savez(args.dst, **out)
    print(f"wrote {args.dst}: cap={cap} n_active={int(src['n_active'])} "
          f"nht_dim={args.dim}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

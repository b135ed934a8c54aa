"""Any-to-any gaussian asset transcoder CLI.

Mirror of the reference's export/scripts/transcode.py: convert between
PLY / USDA / USDZ / trainer checkpoints, merge multiple inputs, apply a
normalizing 4x4 transform, and KD-partition into size-bounded
ParticleFields.

Usage:
  python scripts/transcode.py in.ply out.usdz
  python scripts/transcode.py a.ply b.usda merged.usda
  python scripts/transcode.py ckpt_last.npz out.ply --normalize
  python scripts/transcode.py big.ply out.usda --max-particles 1000000
"""
import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("paths", nargs="+",
                    help="input asset(s) followed by the output path")
    ap.add_argument("--transform", type=str, default=None,
                    help="path to a .npy 4x4 world transform to apply")
    ap.add_argument("--normalize", action="store_true",
                    help="recenter on the median particle position and "
                         "scale the median spread to 1")
    ap.add_argument("--max-particles", type=int, default=None,
                    help="KD-partition outputs to at most N particles "
                         "per file")
    args = ap.parse_args()
    if len(args.paths) < 2:
        ap.error("need at least one input and one output path")
    inputs, output = args.paths[:-1], args.paths[-1]

    transform = None
    if args.transform:
        transform = np.load(args.transform).astype(np.float64)
        if transform.shape != (4, 4):
            raise SystemExit(f"--transform must be 4x4, got "
                             f"{transform.shape}")
    if args.normalize:
        from threedgrut_tpu.export.transcode import load_any
        pts = np.concatenate([load_any(p)["positions"] for p in inputs])
        center = np.median(pts, axis=0)
        spread = np.median(np.linalg.norm(pts - center, axis=1))
        s = 1.0 / max(float(spread), 1e-6)
        transform = np.eye(4)
        transform[:3, :3] *= s
        transform[:3, 3] = -center * s

    from threedgrut_tpu.export.transcode import transcode
    written = transcode(inputs, output, transform=transform,
                        max_particles_per_partition=args.max_particles)
    for p in written:
        print(p)


if __name__ == "__main__":
    main()

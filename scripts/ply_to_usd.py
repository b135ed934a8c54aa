"""PLY -> USD ParticleField converter.

Mirror of the reference's export/scripts/ply_to_usd.py: thin wrapper
over the transcoder for the most common conversion.

Usage:
  python scripts/ply_to_usd.py model.ply model.usdz
"""
import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="3DGS .ply asset")
    ap.add_argument("output", nargs="?", default=None,
                    help=".usda/.usdz output (default: input with .usdz)")
    args = ap.parse_args()
    output = args.output or os.path.splitext(args.input)[0] + ".usdz"

    from threedgrut_tpu.export.transcode import transcode
    for p in transcode([args.input], output):
        print(p)


if __name__ == "__main__":
    main()

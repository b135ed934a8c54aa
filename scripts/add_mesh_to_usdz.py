"""Insert a proxy mesh file into a gaussian .usdz archive.

Mirror of the reference's export/scripts/add_mesh_to_usdz.py: packs a
mesh asset (.glb/.obj/...) alongside the default ParticleField layer in
the aligned usdz container, preserving the default-layer-first rule.

Usage:
  python scripts/add_mesh_to_usdz.py model.usdz proxy.glb
"""
import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("usdz", help="existing .usdz archive (modified in place)")
    ap.add_argument("mesh", help="mesh file to insert (.glb/.obj/...)")
    ap.add_argument("--name", default=None,
                    help="entry name inside the archive (default: basename)")
    args = ap.parse_args()

    from threedgrut_tpu.export.usd import add_file_to_usdz
    add_file_to_usdz(args.usdz, args.mesh, entry_name=args.name)
    import zipfile
    with zipfile.ZipFile(args.usdz) as z:
        for n in z.namelist():
            print(n)


if __name__ == "__main__":
    main()

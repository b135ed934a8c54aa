"""Validate a PPISP -> SH bake against the live ISP.

Mirror of the reference's export/scripts/post_processing_sh_bake_
validation.py: for a gaussian asset + PPISP sidecar, bake the linear
part of the ISP (responsivity * 2^exposure — the reference's
scale_sh_output, sh_bake.py:33) into the SH coefficients and report the
max/mean radiance error between [linearly scaled original radiance] and
[baked radiance], sampled over random view directions. The vignetting,
homography normalization and CRF are nonlinear/spatial; fitting those
requires the optimization bake (threedgrut_tpu/export/sh_bake.py).

Usage:
  python scripts/sh_bake_validation.py model.usdz ppisp.usda \
      [--camera 0] [--frame 0] [--samples 4096]
"""
import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("asset", help="gaussian asset (.ply/.usda/.usdz/.npz)")
    ap.add_argument("ppisp", help="PPISP sidecar .usda")
    ap.add_argument("--camera", type=int, default=0)
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--samples", type=int, default=4096)
    args = ap.parse_args()

    import jax.numpy as jnp
    from threedgrut_tpu.export import usd as usd_mod
    from threedgrut_tpu.export.transcode import load_any
    from threedgrut_tpu.ops.sh import eval_sh_radiance

    attrs = load_any(args.asset)
    ppisp = usd_mod.import_ppisp_usda(args.ppisp)
    sh = np.asarray(attrs["sh_coefficients"], np.float32)  # [N,K,3]
    deg = int(np.sqrt(sh.shape[1])) - 1
    n = min(sh.shape[0], args.samples)
    rng = np.random.default_rng(0)
    pick = rng.choice(sh.shape[0], size=n, replace=False)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    baked = usd_mod.bake_ppisp_into_sh(sh, ppisp, camera_idx=args.camera,
                                       frame_idx=args.frame)

    rad = np.asarray(eval_sh_radiance(jnp.asarray(sh[pick]),
                                      jnp.asarray(dirs), deg))
    rad_baked = np.asarray(eval_sh_radiance(jnp.asarray(baked[pick]),
                                            jnp.asarray(dirs), deg))

    s = (2.0 ** float(np.asarray(ppisp["responsivity"])[args.camera])
         * 2.0 ** float(np.asarray(ppisp["exposure"])[args.frame]))
    rad_isp = rad * s

    err = np.abs(rad_baked - rad_isp)
    print(f"samples={n} sh_degree={deg} camera={args.camera} "
          f"frame={args.frame}")
    print(f"max |baked - isp(linear part)| = {err.max():.3e}")
    print(f"mean |baked - isp(linear part)| = {err.mean():.3e}")
    ok = err.max() < 1e-4
    print("OK" if ok else "MISMATCH (vignette/CRF excluded by design; "
          "check camera/frame indices)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

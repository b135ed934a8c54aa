"""On-chip Pallas-vs-oracle forward parity localization probe.

Round-5 investigation tool (VERDICT r4 item 8: commit the probes).
Renders the bench cloud through render_gut and render_oracle on the
real device under several configs and prints, per config: PSNR (dB),
max |err|, and the fraction of pixels with |err| > 1e-3 — enough to
tell a *kill-boundary discontinuity* (few pixels, large error: a ~1e-7
transmittance difference flips the frozen-ray decision on pixels whose
T crosses min_transmittance) from *bulk precision noise* (all pixels,
small error: a Mosaic lowering regression).

Usage: python tools/parity_probe.py [--side 200] [--n 60000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def bench_cloud(n, cap):
    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 GaussianParams,
                                                 GaussianState)
    from threedgrut_tpu.ops.sh import rgb_to_sh0
    rng = np.random.default_rng(0)
    pos = np.zeros((cap, 3), np.float32)
    pos[:n, 0:2] = rng.uniform(-2.5, 2.5, (n, 2))
    pos[:n, 2] = rng.uniform(2.0, 9.0, n)
    pos[n:, 2] = 1e6
    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scales = np.log(rng.uniform(0.01, 0.05, (cap, 3)).astype(np.float32))
    dens = (rng.normal(size=(cap, 1)) * 0.5).astype(np.float32)
    albedo = np.asarray(rgb_to_sh0(jnp.asarray(
        rng.uniform(0, 1, (cap, 3)).astype(np.float32))))
    spec = (rng.normal(size=(cap, 45)) * 0.02).astype(np.float32)
    return GaussianState(
        params=GaussianParams(
            positions=jnp.asarray(pos), rotation=jnp.asarray(quat),
            scale=jnp.asarray(scales), density=jnp.asarray(dens),
            features_albedo=jnp.asarray(albedo),
            features_specular=jnp.asarray(spec)),
        n_active=jnp.asarray(n, jnp.int32),
        n_active_features=jnp.asarray(3, jnp.int32),
        config=GaussianModelConfig())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=200)
    ap.add_argument("--n", type=int, default=60000)
    args = ap.parse_args()

    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut
    from threedgrut_tpu.render.oracle import render_oracle

    side = args.side
    cap = ((args.n + 255) // 256) * 256
    model = bench_cloud(args.n, cap)
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    ut = UTConfig()

    configs = {
        # matched exact-kill semantics (bench probe config)
        "exact_kill": RasterConfig(max_pairs=86 * 8192, exact_kill=True),
        # kill disabled on BOTH sides (min_transmittance ~ 0): no
        # freeze discontinuity -> isolates bulk precision error
        "nokill_eps": RasterConfig(max_pairs=86 * 8192, exact_kill=True,
                                   min_transmittance=1e-30),
        # MXU scan off (VPU shift chain), exact kill
        "vpu_scan": RasterConfig(max_pairs=86 * 8192, exact_kill=True,
                                 scan_mxu=False),
        # unfused hit dots, exact kill
        "unfused": RasterConfig(max_pairs=86 * 8192, exact_kill=True,
                                fused_mxu=False),
    }
    for name, rc in configs.items():
        got = render_gut(cam, ut, rc, model, sh_degree=3)
        ref = render_oracle(cam, ut, rc, model, sh_degree=3)
        g = np.asarray(got["pred_features"])
        r = np.asarray(ref["pred_features"])
        gh = np.asarray(got["hits_count"])[..., 0]
        rh = np.asarray(ref["hits_count"])[..., 0]
        err = np.abs(g - r)
        mse = float(np.mean(err ** 2))
        db = 999.0 if mse == 0 else -10 * np.log10(mse)
        # bulk parity over hit-agreeing pixels: an acceptance-threshold
        # flip (|sq - thr| ~ 1e-7 epsilon difference) adds/drops one
        # min-alpha contribution (~1/255) on isolated pixels — an
        # inherent floor of ANY reimplementation, orthogonal to the
        # bf16-lowering bulk-noise class this probe exists to catch.
        agree = gh == rh
        mse_b = float(np.mean((err ** 2)[agree]))
        db_b = 999.0 if mse_b == 0 else -10 * np.log10(mse_b)
        print(f"{name:12s} psnr={db:7.1f} dB  bulk={db_b:7.1f} dB  "
              f"max|e|={err.max():.2e}  flips={1 - agree.mean():.5f}",
              flush=True)


if __name__ == "__main__":
    main()

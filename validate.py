"""Validation matrix CLI (reference validate.py equivalent).

Trains small-budget runs across the {SH, NHT} x {3DGUT, 3DGRT} matrix on
synthetic or real data and writes a markdown report with PSNR/SSIM and
throughput per experiment.

Usage:
  python validate.py [--path /data/lego] [--iterations 200] [--out report.md]
(with no --path a synthetic oracle-rendered scene is used, making the
validation self-contained)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np


def run_experiment(name, feature_type, sorted_mode, dataset, iterations,
                   capacity=256):
    import jax.numpy as jnp

    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 initialize_from_points)
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.train.trainer import Trainer, TrainerConfig

    cfg = GaussianModelConfig(feature_type=feature_type,
                              nht_feature_dim=16,
                              max_sh_degree=2)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, (128, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(3.0, 5.5, 128)
    model = initialize_from_points(cfg, pts, capacity=capacity)
    tconf = TrainerConfig(
        strategy="mcmc", n_iterations=iterations,
        raster=RasterConfig(max_pairs=1 << 13,
                            sorted_compositing=sorted_mode,
                            kernel_degree=4 if sorted_mode else 2,
                            min_transmittance=1e-3 if sorted_mode else 1e-4),
        init_n_features=0, max_n_features=2, increase_frequency=20)
    tconf.mcmc = tconf.mcmc.replace(relocate_start=20, relocate_frequency=40,
                                    add_start=20, add_frequency=40,
                                    max_n_gaussians=capacity)
    tr = Trainer(tconf, dataset, model)
    t0 = time.time()
    for step in range(iterations):
        tr.train_iteration(dataset[step % len(dataset)])
    train_s = time.time() - t0
    metrics = tr.validate()
    return dict(name=name, psnr=metrics["psnr"], ssim=metrics["ssim"],
                train_s=train_s, iters_per_s=iterations / train_s,
                n_gaussians=int(tr.model.n_active))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", default=None)
    parser.add_argument("--iterations", type=int, default=120)
    parser.add_argument("--out", default="report.md")
    args = parser.parse_args()

    if args.path:
        from train import make_dataset
        from threedgrut_tpu.config.loader import load_config
        conf = load_config("apps/nerf_synthetic_3dgut",
                           overrides=[f"path={args.path}"])
        dataset = make_dataset(conf, "train")
    else:
        from test_training import SyntheticDataset
        dataset = SyntheticDataset(n_views=6)

    experiments = [
        ("3DGUT + SH", "sh", False),
        ("3DGRT + SH (sorted)", "sh", True),
        ("3DGUT + NHT", "nht", False),
    ]
    rows = []
    for name, ftype, sorted_mode in experiments:
        print(f"=== {name} ===")
        r = run_experiment(name, ftype, sorted_mode, dataset,
                           args.iterations)
        print(r)
        rows.append(r)

    with open(args.out, "w") as f:
        f.write("# Validation report (threedgrut_tpu)\n\n")
        f.write(f"iterations per experiment: {args.iterations}\n\n")
        f.write("| experiment | PSNR | SSIM | train (s) | it/s | N |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['name']} | {r['psnr']:.2f} | {r['ssim']:.3f} | "
                    f"{r['train_s']:.1f} | {r['iters_per_s']:.1f} | "
                    f"{r['n_gaussians']} |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

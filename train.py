"""Training CLI: `python train.py --config-name apps/nerf_synthetic_3dgut
path=/data/lego [key=value ...]`.

Mirrors the reference train.py (hydra entry) on the composed-YAML surface
of threedgrut_tpu.config.loader.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np


def make_dataset(conf, split="train"):
    from threedgrut_tpu.data.colmap import ColmapDataset, ScannetppDataset
    from threedgrut_tpu.data.nerf import NeRFDataset

    dtype = conf.dataset.type
    down = conf.dataset.get("downsample_factor", 1)
    if dtype == "nerf":
        return NeRFDataset(conf.path, split=split, downsample=down,
                           bg_color=conf.model.background.color)
    if dtype == "colmap":
        return ColmapDataset(
            conf.path, split=split, downsample=down,
            gsplat_normalize=conf.dataset.get("gsplat_normalize", False),
            gsplat_image_downscale=conf.dataset.get(
                "gsplat_image_downscale", False))
    if dtype == "scannetpp":
        return ScannetppDataset(conf.path, split=split, downsample=down)
    if dtype == "ncore":
        from threedgrut_tpu.data.ncore import NCoreDataset
        ds = conf.dataset
        tr = ds.get("train", {})
        return NCoreDataset(
            conf.path, split=split,
            camera_ids=ds.get("camera_ids"),
            lidar_ids=ds.get("lidar_ids"),
            downsample=float(ds.get("downsample", 1.0)),
            seek_offset_sec=tr.get("seek_offset_sec", 0.0),
            duration_sec=tr.get("duration_sec", -1),
            sample_full_image=tr.get("sample_full_image", True),
            window_size=tr.get("window_size", 256),
            n_samples_per_epoch=tr.get("n_samples_per_epoch", 1000),
            n_train_sample_camera_rays=tr.get(
                "n_train_sample_camera_rays", 4096),
            n_val_image_subsample=ds.get("n_val_image_subsample", 1),
            val_frame_interval=ds.get("val_frame_interval", 8),
            jpeg_backend_cpu=("native" if ds.get(
                "jpeg_backend_cpu", "native") != "PIL" else "PIL"),
            lidar_color_generic_data_name=ds.get(
                "lidar_color_generic_data_name", "rgb"))
    raise ValueError(f"unknown dataset type {dtype}")


def make_model(conf, dataset):
    import jax.numpy as jnp

    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 initialize_from_points,
                                                 random_initialization)

    mc = GaussianModelConfig(
        density_activation=conf.model.density_activation,
        scale_activation=conf.model.scale_activation,
        feature_type=conf.model.feature_type,
        max_sh_degree=min(conf.model.progressive_training.max_n_features,
                          conf.render.particle_radiance_sph_degree),
        nht_feature_dim=conf.model.nht_features.dim,
        default_density=conf.model.default_density,
        default_scale_factor=conf.model.default_scale_factor)

    # static capacity: GS densification grows the count (clone/split), so
    # leave headroom; MCMC has a hard cap (strategy.add.max_n_gaussians).
    # initialization.capacity_headroom overrides the GS default (growth
    # beyond capacity is clipped by the strategy, so this is a
    # memory/size knob, not a correctness one).
    from threedgrut_tpu.models.gaussians import default_capacity_for
    strat = conf.get("strategy", {})
    headroom = conf.get("initialization", {}).get("capacity_headroom", 4.0)
    if "MCMC" in str(strat.get("method", "")):
        cap_for = lambda n0: default_capacity_for(
            max(n0, strat.get("add", {}).get("max_n_gaussians", n0)))
    else:
        cap_for = lambda n0: default_capacity_for(n0, headroom=headroom)

    init = conf.get("initialization", {}).get("method", "colmap")
    iconf = conf.get("initialization", {})
    if conf.get("import_ply", {}).get("enabled"):
        from threedgrut_tpu.export.ply import import_model
        return import_model(conf.import_ply.path, mc)
    if init == "colmap" and hasattr(dataset, "load_points3d"):
        pts, rgb, _ = dataset.load_points3d()
        return initialize_from_points(mc, pts, rgb.astype(np.float32),
                                      capacity=cap_for(len(pts)),
                                      seed=conf.seed_initialization)
    if init in ("lidar", "point_cloud") and hasattr(dataset,
                                                    "load_lidar_init"):
        # lidar/point-cloud initialization (reference model.py:693-730):
        # observer-distance scales when use_observation_points
        pts, rgb, dists = dataset.load_lidar_init(
            num_points=iconf.get("num_points"))
        obs_scale = (dists * iconf.get("observation_scale_factor", 0.01)
                     if iconf.get("use_observation_points", True)
                     else None)
        return initialize_from_points(mc, pts, rgb.astype(np.float32),
                                      observer_scale=obs_scale,
                                      capacity=cap_for(len(pts)),
                                      seed=conf.seed_initialization)
    if init == "fused_point_cloud":
        from threedgrut_tpu.export.ply import read_point_cloud_ply
        pts, rgb = read_point_cloud_ply(iconf["fused_point_cloud_path"])
        return initialize_from_points(mc, pts, rgb,
                                      capacity=cap_for(len(pts)),
                                      seed=conf.seed_initialization)
    if init == "checkpoint":
        from threedgrut_tpu.models.gaussians import state_from_checkpoint
        return state_from_checkpoint(iconf["path"], mc)
    n = conf.get("initialization", {}).get("num_gaussians", 100000)
    extent = dataset.get_scene_extent()
    return random_initialization(mc, n, extent=extent,
                                 capacity=cap_for(n),
                                 seed=conf.seed_initialization)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="apps/nerf_synthetic_3dgut")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    from threedgrut_tpu.config.loader import load_config, to_trainer_config
    from threedgrut_tpu.train.trainer import Trainer

    conf = load_config(args.config_name, overrides=args.overrides)
    if conf.path == "???":
        raise SystemExit("set the dataset path: train.py ... path=/data/...")

    dataset = make_dataset(conf, "train")
    try:
        val_dataset = make_dataset(conf, "val" if conf.dataset.type == "nerf"
                                   else "test")
    except Exception:
        val_dataset = None
    model = make_model(conf, dataset)
    tconf = to_trainer_config(conf)
    out_dir = os.path.join(conf.out_dir, conf.experiment_name or "run")
    trainer = Trainer(tconf, dataset, model, val_dataset=val_dataset,
                      out_dir=out_dir, raw_conf=conf)
    if conf.resume:
        trainer.load_checkpoint(conf.resume)

    ckpt_iters = set(conf.checkpoint.iterations)
    os.makedirs(out_dir, exist_ok=True)

    if conf.get("with_gui"):
        # live-training web viewer (reference utils/gui.py with_gui flag)
        from threedgrut_tpu.playground.live_gui import TrainingGUI

        pos = np.asarray(model.params.positions)
        n_act = int(model.n_active)
        center = pos[:n_act].mean(axis=0) if n_act else np.zeros(3)
        gui = TrainingGUI(trainer, center=tuple(float(c) for c in center),
                          out_dir=out_dir)
        gui.start()
        gui.run(max_steps=tconf.n_iterations)
        trainer.save_checkpoint(os.path.join(out_dir, "ckpt_last.npz"))
        return

    try:
        while trainer.global_step < tconf.n_iterations:
            trainer.run_training(
                max_steps=min(trainer.global_step + conf.log_frequency * 100,
                              tconf.n_iterations),
                log_every=conf.log_frequency * 100)
            if any(trainer.global_step >= c and
                   (trainer.global_step - conf.log_frequency * 100) < c
                   for c in ckpt_iters):
                trainer.save_checkpoint(
                    os.path.join(out_dir, f"ckpt_{trainer.global_step}.npz"))
            freq = conf.checkpoint.get("frequency", 0)
            if freq and (trainer.global_step // freq
                         != (trainer.global_step
                             - conf.log_frequency * 100) // freq):
                # crash insurance: overwrite one rolling checkpoint
                trainer.save_checkpoint(
                    os.path.join(out_dir, "ckpt_periodic.npz"))
            if (tconf.val_frequency
                    and trainer.global_step % tconf.val_frequency < 100
                    and val_dataset is not None):
                print("val:", trainer.validate())
    except KeyboardInterrupt:
        print("interrupted; saving last checkpoint")
    if trainer.ppisp_params is not None and tconf.ppisp_use_controller:
        print("distilling PPISP controller...")
        loss = trainer.distill_ppisp_controller()
        print(f"controller distillation loss: {loss}")
    trainer.save_checkpoint(os.path.join(out_dir, "ckpt_last.npz"))
    if conf.get("export_ply", {}).get("enabled"):
        from threedgrut_tpu.export.ply import export_model
        export_model(trainer.model, conf.export_ply.path
                     or os.path.join(out_dir, "export_last.ply"))
    if conf.test_last and val_dataset is not None:
        final = trainer.validate()
        print("final:", final)
        # machine-readable stats for scripts/benchmark/print_stats.sh
        import json
        with open(os.path.join(out_dir, "final_metrics.json"), "w") as f:
            json.dump({**{k: float(v) for k, v in final.items()
                          if isinstance(v, (int, float))},
                       "train_time_s": trainer.train_wall_time,
                       "n_iterations": int(trainer.global_step),
                       "n_gaussians": int(trainer.model.n_active)}, f)


if __name__ == "__main__":
    main()

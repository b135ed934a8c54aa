"""Prune particles never visible from any training view.

Reference: threedgrut/export/scripts/filter_visibility.py (182 LoC) -
renders every training view, ORs the per-particle visibility masks, and
writes a filtered PLY.

Usage: python scripts/filter_visibility.py --checkpoint ckpt.npz \
           --config-name apps/colmap_3dgut path=/data/scene --out out.ply
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config-name", default="apps/nerf_synthetic_3dgut")
    parser.add_argument("--out", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    import jax.numpy as jnp

    from threedgrut_tpu.config.loader import load_config, to_trainer_config
    from threedgrut_tpu.export.ply import export_ply
    from threedgrut_tpu.render.gut import render_gut
    from threedgrut_tpu.train.trainer import Trainer, camera_from_batch
    from train import make_dataset, make_model

    conf = load_config(args.config_name, overrides=args.overrides)
    tconf = to_trainer_config(conf)
    dataset = make_dataset(conf, "train")
    model = make_model(conf, dataset)
    trainer = Trainer(tconf, dataset, model)
    trainer.load_checkpoint(args.checkpoint)
    model = trainer.model

    visible = np.zeros(model.capacity, bool)
    for i in range(len(dataset)):
        batch = dataset[i]
        cam = camera_from_batch(batch, tconf.ut)
        out = render_gut(cam, tconf.ut, tconf.raster, model,
                         tconf.max_n_features)
        visible |= np.asarray(out["mog_visibility"])
    keep = visible & np.asarray(model.active_mask())
    print(f"visible: {keep.sum()} / {int(model.n_active)}")
    p = model.params
    export_ply(args.out,
               np.asarray(p.positions)[keep], np.asarray(p.rotation)[keep],
               np.asarray(p.scale)[keep], np.asarray(p.density)[keep],
               np.asarray(p.features_albedo)[keep],
               np.asarray(p.features_specular)[keep])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

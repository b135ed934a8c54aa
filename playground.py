"""Interactive playground CLI (reference playground.py equivalent).

Loads a trained checkpoint or PLY, optionally adds demo mesh primitives
(glass sphere / mirror plane), and serves the dependency-free web viewer.

Usage:
  python playground.py --asset runs/run/ckpt_last.npz [--port 8090]
  python playground.py --asset scene.ply --demo-primitives
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np


def load_model(path: str):
    if path.endswith(".ply"):
        from threedgrut_tpu.export.ply import import_model
        return import_model(path)
    if path.endswith(".npz"):
        import jax.numpy as jnp

        from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                     GaussianParams,
                                                     GaussianState)

        data = np.load(path)
        params = {k.split("/", 1)[1]: jnp.asarray(v) for k, v in data.items()
                  if k.startswith("params/") and "nht" not in k}
        cfg = GaussianModelConfig(
            feature_type="nht" if "params/features" in data else "sh")
        return GaussianState(params=GaussianParams(**params),
                             n_active=jnp.asarray(data["n_active"]),
                             n_active_features=jnp.asarray(3, jnp.int32),
                             config=cfg)
    raise ValueError(f"unsupported asset {path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--asset", required=True, help=".npz ckpt or .ply")
    parser.add_argument("--port", type=int, default=8090)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--demo-primitives", action="store_true")
    parser.add_argument("--mesh", action="append", default=[],
                        metavar="FILE[:glass|mirror|pbr]",
                        help=".obj/.glb mesh asset to insert (repeatable)")
    parser.add_argument("--envmap", default=None, help="lat-long image")
    args = parser.parse_args()

    from threedgrut_tpu.playground.engine import (Engine3DGRUT, EngineConfig,
                                                  EnvironmentMap, PBRMaterial)
    from threedgrut_tpu.playground.mesh import (load_mesh_file, make_box,
                                                make_icosphere)
    from threedgrut_tpu.playground.web_gui import ViewerServer, orbit_camera

    model = load_model(args.asset)
    envmap = None
    if args.envmap:
        from PIL import Image
        envmap = EnvironmentMap(np.asarray(Image.open(args.envmap),
                                           np.float32) / 255.0)
    engine = Engine3DGRUT(model, EngineConfig(max_bounces=3), envmap)

    center = np.asarray(model.params.positions[:int(model.n_active)]).mean(0)
    if args.demo_primitives:
        engine.add_primitive(
            make_icosphere(center + [0.5, 0, 0], 0.4, 3),
            PBRMaterial(kind="glass", base_color=(0.95, 0.95, 1.0)))
        engine.add_primitive(
            make_box(center + [-0.8, 0, 0], (0.5, 0.5, 0.5)),
            PBRMaterial(kind="mirror", base_color=(0.9, 0.9, 0.9)))
    for spec in args.mesh:
        path, _, kind = spec.partition(":")
        mat = PBRMaterial(kind=kind or "pbr")
        for m in load_mesh_file(path):
            engine.add_primitive(m, mat)

    res = (args.resolution, args.resolution)

    def render(az, el, dist):
        cam = orbit_camera(az, el, dist, center=center, resolution=res)
        img = engine.render(cam)
        return (img * 255).astype(np.uint8)

    server = ViewerServer(render, resolution=res, port=args.port)
    url = server.start(blocking=False)
    print(f"playground viewer at {url} (ctrl-c to stop)")
    try:
        import time
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()

"""Generate a NeRF-synthetic-format dataset from a procedural teacher
scene, rendered with the production 3DGUT pipeline.

No benchmark datasets ship with this environment (zero egress), so the
real-protocol convergence benchmark (NOTES.md) trains against a
procedurally built "lego-class" teacher: ~60k Gaussians forming colored
towers, arches and a ground slab, rendered to 800x800 PNG views in the
standard transforms_train/val/test.json layout consumed by
threedgrut_tpu.data.nerf.NeRFDataset (and by the reference's loader).

Usage: python scripts/gen_synthetic_scene.py --out /tmp/synth_lego \
           [--side 800] [--n-train 100] [--n-val 16] [--teacher-n 60000]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def build_teacher(n=60000, seed=0):
    """Structured teacher: towers + arch + ground, piecewise colors."""
    import jax.numpy as jnp

    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 GaussianState,
                                                 GaussianParams)
    from threedgrut_tpu.ops.sh import rgb_to_sh0

    rng = np.random.default_rng(seed)
    groups = []
    cols = []

    def add(pts, rgb):
        groups.append(pts)
        cols.append(np.broadcast_to(np.asarray(rgb, np.float32),
                                    (len(pts), 3)).copy())

    n_ground = n // 4
    g = rng.uniform(-1.0, 1.0, (n_ground, 3)).astype(np.float32)
    g[:, 1] = 0.62 + rng.normal(0, 0.01, n_ground)
    add(g, (0.45, 0.42, 0.38))

    n_tower = n // 4
    for cx, cz, rgb in [(-0.45, 0.0, (0.85, 0.2, 0.15)),
                        (0.45, 0.1, (0.15, 0.45, 0.85))]:
        t = np.zeros((n_tower // 2, 3), np.float32)
        t[:, 1] = rng.uniform(-0.35, 0.6, n_tower // 2)
        radius = 0.16 * (1.0 - 0.4 * (0.6 - t[:, 1]) / 0.95)
        ang = rng.uniform(0, 2 * np.pi, n_tower // 2)
        rr = radius * np.sqrt(rng.uniform(0.6, 1.0, n_tower // 2))
        t[:, 0] = cx + rr * np.cos(ang)
        t[:, 2] = cz + rr * np.sin(ang)
        add(t, rgb)

    n_arch = n // 4
    th = rng.uniform(0, np.pi, n_arch)
    a = np.zeros((n_arch, 3), np.float32)
    a[:, 0] = 0.55 * np.cos(th) + rng.normal(0, 0.02, n_arch)
    a[:, 1] = -0.35 - 0.35 * np.sin(th) + rng.normal(0, 0.02, n_arch)
    a[:, 2] = rng.normal(0, 0.05, n_arch)
    add(a, (0.9, 0.75, 0.2))

    n_rest = n - sum(len(p) for p in groups)
    s = rng.normal(0, 1, (n_rest, 3)).astype(np.float32)
    s /= np.maximum(np.linalg.norm(s, axis=1, keepdims=True), 1e-9)
    s = s * 0.22 + np.asarray([0.0, -0.05, -0.45], np.float32)
    add(s, (0.2, 0.8, 0.35))

    pos = np.concatenate(groups)
    rgb = np.concatenate(cols)
    rgb = np.clip(rgb + rng.normal(0, 0.06, rgb.shape), 0.02, 0.98)
    n_total = len(pos)

    cap = ((n_total + 255) // 256) * 256
    pad = cap - n_total

    def padded(x, fill=0.0):
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])

    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scales = np.log(rng.uniform(0.006, 0.016, (cap, 3)).astype(np.float32))
    dens = np.full((cap, 1), 2.0, np.float32)      # sigmoid(2) ~ 0.88
    pos_p = padded(pos)
    pos_p[n_total:, 1] = 1e6
    import jax.numpy as jnp
    albedo = np.asarray(rgb_to_sh0(jnp.asarray(padded(rgb))))
    spec = (rng.normal(size=(cap, 45)) * 0.12).astype(np.float32)
    params = GaussianParams(
        positions=jnp.asarray(pos_p), rotation=jnp.asarray(quat),
        scale=jnp.asarray(scales), density=jnp.asarray(dens),
        features_albedo=jnp.asarray(albedo),
        features_specular=jnp.asarray(spec))
    return GaussianState(params=params,
                         n_active=jnp.asarray(n_total, jnp.int32),
                         n_active_features=jnp.asarray(3, jnp.int32),
                         config=GaussianModelConfig())


def camera_pose(azimuth, elevation, radius):
    """NeRF-synthetic c2w (OpenGL convention: -z forward, y up)."""
    eye = radius * np.asarray([
        np.cos(elevation) * np.sin(azimuth),
        np.sin(elevation),
        np.cos(elevation) * np.cos(azimuth)])
    fwd = -eye / np.linalg.norm(eye)              # look at origin
    up = np.asarray([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    return c2w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--side", type=int, default=800)
    ap.add_argument("--n-train", type=int, default=100)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--teacher-n", type=int, default=60000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut
    from threedgrut_tpu.train.trainer import camera_from_batch
    from threedgrut_tpu.data.protocols import Batch

    teacher = build_teacher(args.teacher_n, args.seed)
    side = args.side
    camera_angle_x = 2 * np.arctan(0.5 / 1.111)   # focal = 1.111 * W
    ut_cfg = UTConfig()
    rc = RasterConfig(max_pairs=1 << 20)

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    render = jax.jit(lambda cam: render_gut(cam, ut_cfg, rc, teacher,
                                            sh_degree=3))

    def write_split(name, n_frames, seed_off):
        frames = []
        d = os.path.join(args.out, name)
        os.makedirs(d, exist_ok=True)
        r2 = np.random.default_rng(args.seed + seed_off)
        for i in range(n_frames):
            az = i / n_frames * 2 * np.pi + r2.uniform(0, 0.05)
            el = np.deg2rad(r2.uniform(15, 45))
            radius = r2.uniform(3.6, 4.4)
            c2w = camera_pose(az, el, radius)
            # NeRF-synthetic camera: OpenGL c2w; our Batch wants
            # camera-to-world in the OpenCV (right-down-front) convention
            cv = c2w.copy()
            cv[:3, 1] *= -1
            cv[:3, 2] *= -1
            b = Batch(rays_ori=np.zeros((side, side, 3), np.float32),
                      rays_dir=np.zeros((side, side, 3), np.float32),
                      T_to_world=cv.astype(np.float32),
                      intrinsics=[1.111 * side, 1.111 * side,
                                  side / 2, side / 2])
            cam = camera_from_batch(b, ut_cfg)
            out = render(cam)
            img = np.asarray(jnp.clip(out["pred_features"], 0, 1))
            op = np.asarray(jnp.clip(out["pred_opacity"], 0, 1))
            rgba = np.concatenate([img, op], axis=-1)
            fp = f"./{name}/r_{i}"
            Image.fromarray((rgba * 255).astype(np.uint8)).save(
                os.path.join(d, f"r_{i}.png"))
            frames.append({"file_path": fp,
                           "transform_matrix": c2w.tolist()})
            if i % 20 == 0:
                print(f"{name} {i}/{n_frames}", flush=True)
        with open(os.path.join(args.out,
                               f"transforms_{name}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x,
                       "frames": frames}, f)

    write_split("train", args.n_train, 1)
    write_split("val", args.n_val, 2)
    write_split("test", args.n_val, 3)
    print("done:", args.out)


if __name__ == "__main__":
    main()

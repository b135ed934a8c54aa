"""Dataloader profiler: batch-generation throughput in isolation
(reference scripts/benchmark/profile_dataloader.py).

Measures frames/s of the composed dataset (any type: nerf, colmap,
scannetpp, ncore) and, when the native C++ decode/prefetch library is
built (threedgrut_tpu/native), compares PIL decode vs native decode vs
native prefetch-ahead.

Usage:
    python scripts/benchmark/profile_dataloader.py \
        --config-name apps/nerf_synthetic_3dgut path=/data/lego \
        [--frames 50] [key=value ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-name", required=True)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import train as train_cli
    from threedgrut_tpu.config.loader import load_config
    from threedgrut_tpu.data import native_loader

    conf = load_config(args.config_name, overrides=args.overrides)
    ds = train_cli.make_dataset(conf, "train")
    n = min(args.frames, len(ds))

    # warm one frame (lazy handles, file cache)
    ds[0]
    t0 = time.perf_counter()
    nbytes = 0
    for i in range(n):
        b = ds[i % len(ds)]
        nbytes += b.rgb_gt.nbytes
    dt = time.perf_counter() - t0
    print(f"dataset[{type(ds).__name__}]: {n / dt:.2f} frames/s "
          f"({nbytes / dt / 1e6:.1f} MB/s decoded)")

    print(f"native decode library: "
          f"{'available' if native_loader.native_available() else 'NOT built'}")
    if native_loader.native_available() and hasattr(ds, "image_paths"):
        paths = list(ds.image_paths)[:n]
        t0 = time.perf_counter()
        for p in paths:
            native_loader.decode_image(p)
        dt = time.perf_counter() - t0
        print(f"native sequential decode: {len(paths) / dt:.2f} frames/s")

        loader = native_loader.NativePrefetchLoader(paths)
        loader.prefetch(range(len(paths)))
        t0 = time.perf_counter()
        for i in range(len(paths)):
            loader.get(i)
        dt = time.perf_counter() - t0
        print(f"native prefetch-ahead:    {len(paths) / dt:.2f} frames/s")


if __name__ == "__main__":
    main()

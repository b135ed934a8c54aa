#!/usr/bin/env python
"""Regenerate tests/fixtures/parity_cloud.ply (deterministic).

The fixture is a reference-format 3DGS PLY (same field layout the
reference's importer consumes, /root/reference/threedgrut/export/
importers/ply.py: x/y/z, f_dc_*, channel-major f_rest_*, opacity,
scale_*, rot_*) used by tests/test_ply_parity.py as the
cross-implementation parity artifact: one cloud, imported through the
public interchange format, rendered through every in-repo path.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threedgrut_tpu.export.ply import export_ply  # noqa: E402


def make_cloud(n=512, seed=11):
    rng = np.random.default_rng(seed)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0:2] = rng.uniform(-1.8, 1.8, (n, 2))
    pos[:, 2] = rng.uniform(2.0, 7.0, n)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scale = np.log(rng.uniform(0.03, 0.12, (n, 3)).astype(np.float32))
    density = rng.normal(size=(n, 1)).astype(np.float32) * 0.8
    albedo = rng.uniform(-1.0, 1.5, (n, 3)).astype(np.float32)
    spec = (rng.normal(size=(n, 45)) * 0.15).astype(np.float32)
    return pos, quat, scale, density, albedo, spec


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "parity_cloud.ply")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    export_ply(out, *make_cloud())
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")

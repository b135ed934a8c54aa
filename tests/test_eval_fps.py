"""Smoke test for scripts/eval_fps.py (scene-calibrated eval budget).

Builds a tiny trainer-format .npz checkpoint, runs the script in-process
(CPU interpret mode via conftest), and checks that the orbit probe
calibrates the pair budget DOWN from the training budget and that the
calibrated program renders (JSON record line emitted).
"""
import json
import os
import runpy
import sys

import numpy as np

SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                      "eval_fps.py")


def _write_tiny_checkpoint(path, n=400, cap=512):
    rng = np.random.default_rng(0)
    pos = np.zeros((cap, 3), np.float32)
    pos[:n] = rng.uniform(-1.0, 1.0, (n, 3))
    pos[n:, 2] = 1e6
    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    flat = {
        "params/positions": pos,
        "params/rotation": quat,
        "params/scale": np.log(rng.uniform(0.02, 0.08, (cap, 3))
                               ).astype(np.float32),
        "params/density": (rng.normal(size=(cap, 1)) * 0.5
                           ).astype(np.float32),
        "params/features_albedo": rng.uniform(-0.5, 0.5, (cap, 3)
                                              ).astype(np.float32),
        "params/features_specular": (rng.normal(size=(cap, 45)) * 0.02
                                     ).astype(np.float32),
        "n_active": np.asarray(n, np.int32),
        "n_active_features": np.asarray(3, np.int32),
    }
    np.savez(path, **flat)


def test_eval_fps_calibrates_and_renders(tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt.npz")
    _write_tiny_checkpoint(ckpt)
    train_budget = 2 * 8192
    argv = ["eval_fps.py", "--checkpoint", ckpt,
            "--width", "64", "--height", "48",
            "--frames", "2", "--probe-views", "3",
            "--train-budget", str(train_budget)]
    old_argv = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
    except SystemExit as e:
        assert e.code in (0, None)
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    rec = json.loads([ln for ln in out.splitlines()
                      if ln.startswith("{")][-1])
    assert rec["unit"] == "FPS" and rec["value"] > 0
    assert rec["n_particles"] == 400
    # 400 tiny particles need far fewer pairs than the training budget
    assert rec["budget"] < train_budget
    assert rec["budget"] % 8192 == 0

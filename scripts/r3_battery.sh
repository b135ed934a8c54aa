#!/bin/bash
# Round-3 end-of-round chip battery: headline bench (warms the driver's
# compile cache), 3DGRT + fisheye benches, and an eval-FPS measurement
# on the 30k GS checkpoint. Run AFTER the convergence runs release the
# chip (one TPU process at a time).
set -u
cd /root/repo
echo "=== bench.py (3DGUT headline) ==="
timeout 1700 python bench.py
echo "=== 3DGRT sorted bench ==="
timeout 1700 python tests/tpu_bench_grt.py 2>&1 | tail -3
echo "=== fisheye bench ==="
timeout 1700 python tests/tpu_bench_fisheye.py 2>&1 | tail -3
echo "=== eval FPS on the 30k checkpoint ==="
timeout 1700 python - <<'EOF'
import os, sys, time
sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.getcwd(), ".jax_cache"))
import jax, jax.numpy as jnp
from threedgrut_tpu.models.gaussians import state_from_checkpoint, \
    GaussianModelConfig
from threedgrut_tpu.ops.cameras import make_pinhole
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut

ckpt = "runs/conv_gs_r3/ckpt_30000.npz"
if not os.path.exists(ckpt):
    print("no checkpoint; skipping")
    sys.exit(0)
model = state_from_checkpoint(ckpt, GaussianModelConfig())
side = 800
cam = make_pinhole(resolution=(side, side), focal=(1.1 * side, 1.1 * side),
                   principal=(side / 2, side / 2))
# published-metrics semantics: exact kill, f32 records
rc = RasterConfig(max_pairs=96 * 8192, exact_kill=True, records_bf16=False)

@jax.jit
def render():
    out = render_gut(cam, UTConfig(), rc, model, sh_degree=3)
    return out["pred_features"]

img = render(); jax.block_until_ready(img)
n, t0 = 40, time.time()
for _ in range(n):
    img = render()
jax.block_until_ready(img)
dt = (time.time() - t0) / n
print(f"eval render {side}x{side}, n={int(model.n_active)}: "
      f"{dt*1e3:.2f} ms = {1/dt:.1f} FPS "
      f"(reference lego 3DGUT eval: 846 FPS on RTX 5090)")
EOF

"""threedgrut_tpu: TPU-native differentiable Gaussian-particle rendering.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
nv-tlabs/3dgrut (3DGRT ray tracing + 3DGUT unscented-transform
rasterization + training stack), designed TPU-first:

- static-shape capacity model for the particle mixture,
- sort-based tile binning (no device->host syncs),
- Pallas tile-compositing kernels with custom VJPs,
- pjit/shard_map data- and tile-parallelism over device meshes.

Reference behavior contracts are cited per-module as
``/root/reference/<path>:<line>``.
"""

__version__ = "0.1.0"

"""Shared rasterizer configuration and ray utilities."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..ops.cameras import (CameraModel, CameraModelType, ShutterType,
                           fisheye_camera_rays, pinhole_camera_rays)
from ..ops.quaternion import quat_slerp, quat_to_rotmat


@struct.dataclass
class RasterConfig:
    """Static rendering configuration (configs/render/3dgut.yaml)."""
    kernel_degree: int = struct.field(pytree_node=False, default=2)
    min_response: float = struct.field(pytree_node=False, default=0.0113)
    min_alpha: float = struct.field(pytree_node=False, default=1.0 / 255.0)
    max_alpha: float = struct.field(pytree_node=False, default=0.99)
    min_transmittance: float = struct.field(pytree_node=False, default=1e-4)
    t_min: float = struct.field(pytree_node=False, default=0.0)
    t_max: float = struct.field(pytree_node=False, default=1e37)
    tile_culling: bool = struct.field(pytree_node=False, default=True)
    k_buffer_size: int = struct.field(pytree_node=False, default=0)
    # per-ray depth re-sorting of each candidate chunk (3DGRT semantics /
    # k_buffer_size > 0 configs)
    sorted_compositing: bool = struct.field(pytree_node=False, default=False)
    # ordering window of the per-ray re-sort (power of two <= 256): each
    # window of depth-consecutive candidates sorts independently - the
    # analogue of the reference's k_buffer_size=16 depth buffer; 256 =
    # full-chunk ordering (strictly wider than the reference)
    # per-ray ordering window of sorted compositing; 16 matches the
    # reference's k=16 hit buffer and the round-3 on-chip adoption
    # (45.8 dB vs full-chunk ordering, 3x the W=64 throughput)
    sort_window: int = struct.field(pytree_node=False, default=16)
    max_pairs: int = struct.field(pytree_node=False, default=1 << 21)
    # max_pairs must stay a multiple of the kernel CHUNK (128)
    # route param gradients through the particle-order interval fold
    # (ops/pallas/fold.py) instead of XLA's scatter-add lowering
    # (measured 15.3 -> 16.4 it/s on the v5e bench; tests/tpu_bench2.py)
    grad_fold: bool = struct.field(pytree_node=False, default=True)
    # alpha-blend per-hit normals into a pred_normals output (reference
    # render.enable_normals; forward-only like the reference)
    enable_normals: bool = struct.field(pytree_node=False, default=False)
    # exact reference transmittance-kill semantics (see
    # RasterKernelConfig.exact_kill); False trades small per-channel
    # residuals (verified <2e-3 max, tests/test_render_parity.py
    # TestRelaxedKill) for ~10-13 fewer elementwise ops per chunk visit
    exact_kill: bool = struct.field(pytree_node=False, default=True)
    # bfloat16 record streaming inside the raster op (see
    # RasterKernelConfig.records_bf16; reference particle_feature_half)
    records_bf16: bool = struct.field(pytree_node=False, default=False)
    # chunk-aligned per-tile segments (ops/binning.py _align_segments):
    # no boundary chunk is shared between tiles, so the raster kernels
    # never re-visit boundary chunks; alignment padding consumes pair
    # budget (auto-calibration grows it via the overflow signal)
    aligned_segments: bool = struct.field(pytree_node=False, default=False)
    # all-rays-dead early exit in the kernel chunk loops (see
    # RasterKernelConfig.early_exit): the data-dependent while condition
    # costs a cross-lane max + VPU->scalar sync per chunk visit, which
    # only pays off on long segments (3DGRT); 3DGUT tiles average ~3
    # visits
    early_exit: bool = struct.field(pytree_node=False, default=True)
    # fuse the per-chunk small matmuls into one wide lane-concatenated
    # MXU call (see RasterKernelConfig.fused_mxu). Forward fusion is
    # the default since the round-4 precision fix (dispatch-bound at 3
    # split passes); the fused backward measured slower and stays off.
    fused_mxu: bool = struct.field(pytree_node=False, default=True)
    fused_mxu_bwd: bool = struct.field(pytree_node=False, default=False)
    # MXU transmittance scan (see RasterKernelConfig.scan_mxu): replaces
    # the Hillis-Steele prefix-product shift chain with one triangular
    # matmul in log space. On-chip A/B (round 4): 18.70 -> 20.41 it/s.
    scan_mxu: bool = struct.field(pytree_node=False, default=True)
    # gradient-fold route variants (render/gut.py _gather_records_fold):
    # fold_wide uses the superblock full-MXU fold kernel
    # (ops/pallas/fold.py fold_sorted_intervals_wide); grad_bf16 rounds
    # the per-PAIR record gradients to bfloat16 before the un-permute
    # gather + fold (halves the dominant HBM gather; per-pair gradients
    # are pre-accumulation SGD noise, unlike the round-3-rejected bf16
    # forward geometry - gate on the grad-cosine test before enabling)
    fold_wide: bool = struct.field(pytree_node=False, default=True)
    grad_bf16: bool = struct.field(pytree_node=False, default=False)
    # flat visit-grid raster kernels (see RasterKernelConfig.flat_grid):
    # one Pallas grid step per chunk visit, Mosaic-pipelined. Measured
    # on v5e (round 4): 17.2 it/s vs 18.67 for the strip kernels on the
    # headline bench — the strip kernels' per-visit scalar machinery is
    # cheaper than the flat grid's per-visit block re-DMA, so this stays
    # opt-in for profiling only.
    flat_grid: bool = struct.field(pytree_node=False, default=False)
    # skip the sorted paths' bitonic network (and the sorted backward's
    # whole pullback body) on all-dead chunk visits; exact semantics
    # (see RasterKernelConfig.sort_skip_dead)
    sort_skip_dead: bool = struct.field(pytree_node=False, default=True)
    # the same all-dead guard on the unsorted backward body; off pending
    # an on-chip A/B (see RasterKernelConfig.skip_dead_bwd)
    skip_dead_bwd: bool = struct.field(pytree_node=False, default=False)


def camera_rays_world(cam: CameraModel):
    """Per-pixel world-space rays through the ray-generation pose.

    Returns (origins [H,W,3], dirs [H,W,3]). Matches dataset raygen
    (threedgrut/datasets/utils.py:61-105) + camera_to_world transform.
    For rolling-shutter cameras the reference renderer generates rays
    from the MID-shutter pose (gutRenderer.cu:265-267,
    interpolatedSensorPose(start, end, 0.5)) while the projection side
    uses the true per-time poses; global shutter start == mid == end.
    """
    w, h = cam.resolution
    if cam.model_type == int(CameraModelType.OPENCV_FISHEYE):
        o, d = fisheye_camera_rays(w, h, cam.focal, cam.principal,
                                   cam.radial[:4], cam.max_angle)
    else:
        o, d = pinhole_camera_rays(w, h, cam.focal[0], cam.focal[1],
                                   cam.principal[0], cam.principal[1])
    if cam.shutter_type == int(ShutterType.GLOBAL):
        q_ray, t_ray = cam.q_start, cam.t_start
    else:
        q_ray = quat_slerp(cam.q_start, cam.q_end, 0.5)
        t_ray = 0.5 * (cam.t_start + cam.t_end)
    # world <- camera: x_w = R^T (x_c - t)
    rot = quat_to_rotmat(q_ray)  # world->camera rotation
    cam_center = -jnp.einsum("ij,i->j", rot, t_ray, precision="highest")
    d_w = jnp.einsum("ij,hwi->hwj", rot, d, precision="highest")
    o_w = jnp.broadcast_to(cam_center, d_w.shape) + jnp.einsum(
        "ij,hwi->hwj", rot, o, precision="highest")
    return o_w, d_w

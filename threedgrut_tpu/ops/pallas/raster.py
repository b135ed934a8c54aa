"""Pallas TPU tile-compositing kernels (forward + custom VJP).

TPU-native redesign of the reference per-tile renderer
(threedgut_tracer .../renderers/gutKBufferRenderer.cuh, K=0 "unsorted"
global-Z path and its warp-scan `evalForwardNoKBufferBalanced`
:354-529): each grid program owns one 16x16 pixel tile and walks its
depth-ordered candidate list CHUNK(=128) particles at a time, fully
vectorized as [256 pixels x 128 candidates] register tiles:

  alpha[256,K]   : full 3D ray/particle max-response (gaussianParticles
                   .slang:206-243 math) for all (pixel, candidate) pairs,
  prefix product : Hillis-Steele scan along the candidate (lane) axis
                   replaces the serial transmittance recurrence (the
                   reference's __shfl_up_sync scan),
  accumulation   : weighted feature/depth reductions over the lane axis
                   (MXU matmuls for per-particle features).

Two *geometry* modes (static):
  general       : full canonical-frame transform per (pair, pixel); works
                  for arbitrary ray origins (rolling shutter, secondary
                  rays, model.trace()),
  shared_origin : all rays in a dispatch share one origin (pinhole /
                  fisheye camera, global shutter - the training hot path).
                  The response factorizes into two small MXU matmuls
                  against per-particle quadratic forms (chunk_hits_fast).

Two *feature* modes (static):
  constant : per-particle precomputed features (SH radiance evaluated at
             the sensor->particle direction; PerRayParticleFeatures=false,
             gutProjector.cuh:306-310),
  nht      : Neural-Harmonic-Texture features interpolated per (pair,
             pixel) at the canonical intersection point via canonical-
             tetrahedron barycentric weights + sincos activation
             (neuralHarmonicFeaturesParticle.slang:46-196).

The backward kernel replays the walk front-to-back using the residual
formulation of the reference (gaussianParticles.cuh:484-751: gradients
from integrated totals, no per-hit state), and pulls cotangents back to
the record fields with ``jax.vjp`` of the same chunk functions the forward
uses - JAX autodiff inside the kernel replaces both the hand-derived CUDA
gradients and the Slang autodiff pipeline.

Data layout (built by threedgrut_tpu/render/gut.py):
  records [C, R, CHUNK] f32: C chunk blocks; row = field. R and the field
          offsets depend on the (geometry, feature) mode - see
          RasterKernelConfig. One chunk = one contiguous DMA.
  rays    [T, 256, 8] f32: lanes 0-2 origin, 3-5 dir, 6 tmin, 7 tmax.
  out     [T, 256, OUT] f32: lanes 0..F-1 features, F alpha, F+1 depth,
          F+2 hits, F+3 final transmittance (OUT = round_up(F+4, 8)).
Tile pair segments are raw [start, end) ranges of the tile-sorted pair
list; chunk DMAs are floor/ceil-aligned around each range with boundary
lanes masked, and the backward accumulates shared boundary chunks with a
sequential read-modify-write (TPU grids execute sequentially).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hit import particle_response, particle_response_dsq
from .mxu import dot_cot, dot_f32

# Mosaic lowers an f32 dot with NO explicit precision to one bf16 MXU
# pass: BOTH operands are rounded to 8 mantissa bits (~2^-9 relative).
# That is pixel-scale noise in this kernel's value math — the round-4
# probe measured the full fwd pipeline at only 34.6 dB vs the f32
# oracle on a 60k-particle scene (103 dB once fixed), and GT images
# rendered through it cap training ~3 dB below the clean-kernel
# protocol. Every value-carrying dot in this file therefore goes
# through ops/pallas/mxu.dot_f32 (2-3 split bf16 passes, ~2^-17; the
# fp32 contract mode measured 21.5 -> 13.3 it/s). Do not add an
# unannotated dot_general to this file.

TILE_PIX = 256  # 16 x 16
# Candidates per streamed chunk (lane width of the compute blocks).
# 128 adopted as default from the round-3 on-chip A/B
# (tests/tpu_profile15.py, THREEDGRUT_CHUNK=128): vs 256 it cuts padded
# lane-evals 317M -> 235M on the bench workload (tools/measure_lanes.py)
# for a measured train-step win of 56.17 -> 53.64 ms (bf16+nokill
# variants); the extra per-chunk loop/DMA overhead eats part of the
# lane saving in fwd (26.5 -> 26.1) but bwd keeps it. Chunk-ALIGNED
# segments were re-measured OUT at 128 too (75.5 ms step: the +30%
# pair padding inflates expand/gather/fold far beyond the lane win).
# Must stay a multiple of the 128-lane DMA alignment: CHUNK=64 fails
# Mosaic compilation outright ("Slice shape along dimension 2 must be
# aligned to tiling (128)", round-3 on-chip attempt) — 128 is the
# hardware floor for the chunk dimension, don't retry smaller.
CHUNK = int(os.environ.get("THREEDGRUT_CHUNK", "128"))
if CHUNK < 128 or CHUNK % 128:
    raise ValueError(
        f"THREEDGRUT_CHUNK={CHUNK}: the chunk dimension rides 128-lane "
        "HBM DMA slices; it must be a positive multiple of 128.")

# retained for backwards compatibility with callers sizing SH records
RECORD_DIM = 16


class RasterKernelConfig(NamedTuple):
    """Static (hashable) kernel configuration."""
    kernel_degree: int = 2
    min_response: float = 0.0113
    min_alpha: float = 1.0 / 255.0
    max_alpha: float = 0.99
    min_transmittance: float = 1e-4
    shared_origin: bool = True
    feature_mode: str = "constant"     # constant | nht
    feat_dim: int = 3                  # ray feature dim F
    # nht only:
    interp_pt_dim: int = 12            # per-tetra-vertex feature dim
    num_frequencies: int = 1           # sincos frequencies
    # 3DGRT: re-sort each chunk per-ray by hit distance before compositing
    # (the TPU analogue of the reference's k=16 hit buffer,
    # gutKBufferRenderer.cuh:62-112, with a full-chunk=128 window)
    sorted_compositing: bool = False
    # per-ray ordering window for sorted compositing (power of two
    # <= CHUNK): each window of depth-consecutive candidates is re-sorted
    # per ray by hit distance - the analogue of the reference's
    # k_buffer_size (16). 256 = full-chunk ordering.
    sort_window: int = 256
    # trace(): every tile scans the SAME full segment, so backward
    # gradients must accumulate across all programs (read-modify-write on
    # every chunk after the first program) instead of the disjoint-segment
    # set-with-boundary-RMW scheme
    shared_segments: bool = False
    # alpha-blended per-hit normals (reference enable_normals,
    # gaussianParticles.cuh:397-401): 3 extra output lanes after the
    # final-transmittance lane. Forward-only - the reference backward
    # carries no normal cotangents either.
    compute_normals: bool = False
    # all-rays-dead early exit in the chunk loops. The outputs are
    # identical either way (the kill mask freezes dead rays); the check
    # costs a cross-lane max + scalar branch per visit, which only pays
    # off on long segments (3DGRT tracing). 3DGUT tiles average ~2 chunk
    # visits, where the check is pure overhead.
    early_exit: bool = True
    # exact reference kill semantics: rays freeze the moment T drops
    # below min_transmittance (gutKBufferRenderer loop break). False
    # drops the freeze machinery (~11 elementwise ops/visit fwd, ~13
    # bwd): T keeps decaying, residual contributions are < 1e-4 per
    # channel (0.03 of an 8-bit quantum) - quality-equivalent, validated
    # by a convergence A/B (NOTES.md round 2).
    exact_kill: bool = True
    # stream pair records through HBM/VMEM as bfloat16 (halves the
    # dominant DMA/gather traffic; reference precedent: optional fp16
    # feature buffers, splatRaster.cpp:205-210 / particle_feature_half).
    # The cast happens INSIDE the op: gradients and all in-kernel math
    # stay f32 (records are upcast right after each chunk DMA), so the
    # custom-VJP boundary keeps f32 records/d_records.
    records_bf16: bool = False
    # fuse the per-chunk small matmuls (7 forward: c/b/q; 8 backward
    # rdots) into one wide lane-concatenated MXU call each. All share
    # one LHS (ray_d, or ray_d^T for the pullback), so the operands
    # concatenate along lanes and the results slice back out — trades 7
    # (resp. 8) MXU dispatches for one + concat/slice relayouts. Round-4
    # on-chip A/B knob (the round-1 fused attempt contracted over 16
    # record rows, a different and slower shape). Adopted as the FORWARD
    # default after the round-4 precision fix: at dot_f32's 3 split
    # passes the 7 small dots are dispatch-bound, so fusing measured
    # 17.13 -> 16.36 ms fwd; the fused BACKWARD regressed (+1.4 ms:
    # the pullback's wide concat is built from 7 freshly-computed
    # [256,K] cotangents, a relayout the fwd's record-row packing
    # avoids) and keeps its own knob.
    fused_mxu: bool = False
    fused_mxu_bwd: bool = False
    # flat visit-grid kernels: one Pallas grid step per (tile, chunk)
    # visit, with records/rays/outputs mapped through prefetch-scalar
    # index maps and Mosaic's native block pipeline doing the chunk
    # prefetching. Eliminates the strip kernels' per-visit scalar
    # machinery (inner while_loop, manual DMA bookkeeping), which the
    # round-4 probes measured as the dominant raster cost (~0.7 us per
    # visit; a bare flat grid step measures ~3 ns). No all-rays-dead
    # early exit — acceptable for camera binning (~3 visits/tile), so
    # render_gut turns it on; trace() (long shared/accel segments whose
    # tails die) keeps the strip kernels.
    flat_grid: bool = False
    # transmittance prefix product on the MXU: exp(logx @ strict-lower-
    # triangular) replaces the 7-stage Hillis-Steele shift chain. The
    # round-4 probe measured 1347 vs 1855 ns/visit (27% less kernel time
    # per visit) at max|T err| 3e-8 on CPU; the on-chip matmul runs at
    # Precision.HIGHEST so the log-space sum keeps f32 accuracy (a
    # single-pass bf16 sum of logs in [-4.6, 0] would carry ~1e-2 abs
    # error into T, the same class of noise as the rejected bf16
    # records). fwd and bwd kernels always share this setting: the
    # hand-derived pullback recomputes t_prev and the two must match.
    # Adopted as default after the round-4 on-chip A/B: 18.70 -> 20.41
    # it/s (+9.1%) on the headline bench, loss identical to 5 decimals.
    scan_mxu: bool = True
    # skip the bitonic sort network (fwd) / the whole sort+composite+
    # pullback body (bwd) on chunk visits where EVERY candidate lane is
    # dead (alpha == 0 after range/segment masking): one cross-lane max
    # + scalar branch per visit buys back the 10-stage (W=16) network on
    # all-dead visits. Exact — outputs are bit-identical either way (a
    # dead chunk contributes w == 0 and leaves T unchanged). Sorted
    # (3DGRT) paths only; 3DGUT's unsorted fwd averages ~3 live
    # visits/tile where the scalar sync is pure overhead.
    sort_skip_dead: bool = True
    # the same all-dead guard on the UNSORTED backward body (boundary
    # chunks shared between tiles arrive mostly masked): skips
    # _fast_pullback's MXU work on dead visits. Off by default pending
    # an on-chip A/B (the bwd strip loop is the single biggest stage).
    skip_dead_bwd: bool = False

    # --- derived layout ---
    @property
    def geom_dim(self) -> int:
        # shared: gro(3) M(9) dens(1); general: pos(3) quat(4) scale(3)
        # dens(1)
        return 13 if self.shared_origin else 11

    @property
    def density_row(self) -> int:
        return 12 if self.shared_origin else 10

    @property
    def particle_feat_dim(self) -> int:
        if self.feature_mode == "constant":
            return self.feat_dim
        return 4 * self.interp_pt_dim  # tetra control points

    @property
    def record_dim(self) -> int:
        r = self.geom_dim + self.particle_feat_dim
        return ((r + 7) // 8) * 8

    @property
    def feat_offset(self) -> int:
        return self.geom_dim

    @property
    def out_dim(self) -> int:
        extra = 3 if self.compute_normals else 0
        return ((self.feat_dim + 4 + extra + 7) // 8) * 8


# record field rows (general geometry)
_POS = 0
_QUAT = 3
_SCALE = 7
_DENSITY = 10

# record field rows (shared-origin geometry)
_GRO = 0      # 0:3   a = M (o - p)  (canonical ray origin), M = diag(1/s) R^T
_M = 3        # 3:12  M row-major (canonical linear map)
# density at row 10 (general) / handled via _density_row(cfg)


def _row(rec, i):
    """Record field row i as [1, K]."""
    return rec[i:i + 1, :]


def _stack_rows(pieces, nrows):
    """Assemble [1,K] rows into a [nrows, K] operand via iota-select
    (Mosaic rejects sublane concatenates of single-sublane pieces)."""
    k = pieces[0].shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, k), 0)
    acc = jnp.zeros((nrows, k), jnp.float32)
    for i, p in enumerate(pieces):
        acc = jnp.where(rows == i, jnp.broadcast_to(p, acc.shape), acc)
    return acc


def _fast_operands(rec, ray_d):
    """Per-particle MXU operands of the shared-origin hit model, derived
    in-kernel from the 16-row records at [1,K] cost (so the record table,
    its gather, and the gradient fold stay 16 rows wide):

      N  = [a]x M   (9 rows)  ->  c = a x (M d) = N d      (3 matmuls)
      u  = M^T a    (3 rows)  ->  a . (M d) = u . d         (1 matmul)

    |M d|^2 itself is computed from the b = M d components (3 matmuls
    against M's record rows) as a SUM OF SQUARES — never through the
    quadratic-form monomial expansion dmono . p6: that form cancels
    catastrophically for needle-like particles (scale ratio >~ 3e3)
    when the ray runs along the long axis, yielding m <= 0, inf
    reciprocals, and 0*inf = NaN gradients that the fold's suffix sums
    then spread across whole 256-lane chunks (root cause of the
    round-2 convergence collapse; the reference computes dot(grd, grd)
    directly, gaussianParticles.cuh:377-383, which is the same
    non-negative sum-of-squares form).

    Conditioning of c matches the cross-product form: each component is
    a 2-term difference of O(|a||M|) products, not the cancelling
    |a|^2|b|^2 - (a.b)^2 expansion.

    Returns (n_mat [9+pad, K], u_mat [8, K]).
    """
    n_rows, u_rows = _fast_operand_rows(rec)
    return _stack_rows(n_rows, 16), _stack_rows(u_rows, 8)


def _fast_operand_rows(rec):
    """The 9 N rows and 3 u rows of _fast_operands as [1,K] pieces."""
    ax, ay, az = _row(rec, _GRO), _row(rec, _GRO + 1), _row(rec, _GRO + 2)
    mr = [[_row(rec, _M + 3 * i + j) for j in range(3)] for i in range(3)]
    n_rows = []
    for j in range(3):   # N row 0 = ay*M2 - az*M1
        n_rows.append(ay * mr[2][j] - az * mr[1][j])
    for j in range(3):   # N row 1 = az*M0 - ax*M2
        n_rows.append(az * mr[0][j] - ax * mr[2][j])
    for j in range(3):   # N row 2 = ax*M1 - ay*M0
        n_rows.append(ax * mr[1][j] - ay * mr[0][j])
    u_rows = [ax * mr[0][j] + ay * mr[1][j] + az * mr[2][j]
              for j in range(3)]
    return n_rows, u_rows


def _pack_triples(triples, k):
    """Lane-concatenate groups of three [1,K] rows into one [8, 3n*K/3]
    MXU operand: group i occupies sublanes 0..2 of lane block i."""
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, k), 0)
    blocks = []
    for rows in triples:
        acc = jnp.zeros((8, k), jnp.float32)
        for i, r in enumerate(rows):
            acc = jnp.where(rows8 == i, jnp.broadcast_to(r, (8, k)), acc)
        blocks.append(acc)
    return jnp.concatenate(blocks, axis=1)


def _fused_hits_mm(rec, ray_d, cfg):
    """(cx, cy, cz, bx, by, bz, q) via ONE [256,8] @ [8,7K] matmul.

    All seven per-chunk contractions of the shared-origin hit model
    share the LHS ray_d, so their [3,K] operands ride one wide
    lane-concatenated MXU call instead of seven small dispatches
    (cfg.fused_mxu)."""
    k = rec.shape[1]
    n_rows, u_rows = _fast_operand_rows(rec)
    m_rows = [_row(rec, _M + i) for i in range(9)]
    wide = _pack_triples(
        [n_rows[0:3], n_rows[3:6], n_rows[6:9],
         m_rows[0:3], m_rows[3:6], m_rows[6:9], u_rows], k)
    d8 = jnp.concatenate(
        [ray_d, jnp.zeros((ray_d.shape[0], 5), jnp.float32)], axis=1)
    res = dot_f32(d8, wide, (((1,), (0,)), ((), ())))
    return [res[:, i * k:(i + 1) * k] for i in range(7)]


def _alpha_from_response(response, density, cfg: RasterKernelConfig):
    alpha = jnp.minimum(cfg.max_alpha, response * density)
    accept = (response > cfg.min_response) & (alpha > cfg.min_alpha)
    return jnp.where(accept, alpha, 0.0)


def _sq_accept_threshold(density, cfg: RasterKernelConfig):
    """Per-particle [1,K] squared-distance acceptance threshold merging
    the response and alpha cutoffs of _alpha_from_response:

        resp > min_response  <=>  sq < f_inv(ln(min_response)/s)
        resp*dens > min_alpha <=> sq < f_inv((ln(min_alpha)-ln dens)/s)

    (s < 0 is the generalized-Gaussian scale, f(sq) = sq^(deg/2)). One
    [256,K] compare against min(thr1, thr2) replaces two compares + and
    on the response/alpha maps. Exact for exp-family degrees (>= 1).
    """
    from ..hit import _GG_SCALE

    deg = cfg.kernel_degree
    s = _GG_SCALE[deg]
    t1 = math.log(cfg.min_response) / s
    t2 = (math.log(cfg.min_alpha)
          - jnp.log(jnp.maximum(density, 1e-30))) / s
    thr = jnp.minimum(t1, t2)
    if deg != 2:
        thr = jnp.power(jnp.maximum(thr, 0.0), 2.0 / deg)
    return thr


def chunk_hits_general(rec, ray_o, ray_d, cfg: RasterKernelConfig,
                       need_canonical: bool = False,
                       need_normals: bool = False):
    """Canonical-frame hit model for K records x 256 rays.

    rec: [R,K] field-major chunk; ray_o/ray_d: [256,3] (pixel-major).
    Returns (alpha [256,K], hit_t [256,K], canonical (3 x [256,K]) | None,
    normals (3 x [256,K]) | None).
    Same math as ops.hit.density_hit (gaussianParticles.slang:206-243);
    normals follow ops.hit.hit_normal (gaussianParticles.cuh:397-401).
    """
    ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]   # [256,1]
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]

    qw, qx, qy, qz = (_row(rec, _QUAT), _row(rec, _QUAT + 1),
                      _row(rec, _QUAT + 2), _row(rec, _QUAT + 3))  # [1,K]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    r00, r01, r02 = 1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)
    r10, r11, r12 = 2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)
    r20, r21, r22 = 2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)

    px, py, pz = _row(rec, _POS), _row(rec, _POS + 1), _row(rec, _POS + 2)
    sx, sy, sz = (_row(rec, _SCALE), _row(rec, _SCALE + 1),
                  _row(rec, _SCALE + 2))
    inv_sx, inv_sy, inv_sz = 1.0 / sx, 1.0 / sy, 1.0 / sz

    # world->local is R^T v (column dot products); [256,K] from here on
    ex, ey, ez = ox - px, oy - py, oz - pz
    gox = (r00 * ex + r10 * ey + r20 * ez) * inv_sx
    goy = (r01 * ex + r11 * ey + r21 * ez) * inv_sy
    goz = (r02 * ex + r12 * ey + r22 * ez) * inv_sz
    gux = (r00 * dx + r10 * dy + r20 * dz) * inv_sx
    guy = (r01 * dx + r11 * dy + r21 * dz) * inv_sy
    guz = (r02 * dx + r12 * dy + r22 * dz) * inv_sz

    inv_norm = jax.lax.rsqrt(jnp.maximum(gux * gux + guy * guy + guz * guz,
                                         1e-32))
    gdx, gdy, gdz = gux * inv_norm, guy * inv_norm, guz * inv_norm

    cx = gdy * goz - gdz * goy
    cy = gdz * gox - gdx * goz
    cz = gdx * goy - gdy * gox
    sq_dist = cx * cx + cy * cy + cz * cz

    response = particle_response(sq_dist, cfg.kernel_degree)
    alpha = _alpha_from_response(response, _row(rec, _DENSITY), cfg)

    proj = -(gdx * gox + gdy * goy + gdz * goz)
    hx, hy, hz = sx * gdx * proj, sy * gdy * proj, sz * gdz * proj
    hit_t = jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-18))
    hit_t = jnp.where(proj < 0.0, -hit_t, hit_t)

    canonical = None
    if need_canonical:
        # canonical intersection (gaussianParticles.slang:181-190)
        canonical = (gox + gdx * proj, goy + gdy * proj, goz + gdz * proj)
    normals = None
    if need_normals:
        # entry of the 3-sigma canonical ellipsoid, elementwise-scaled by
        # R @ s and normalized (gaussianParticles.cuh:397-401)
        rs_x = r00 * sx + r01 * sy + r02 * sz       # [1,K] rows
        rs_y = r10 * sx + r11 * sy + r12 * sz
        rs_z = r20 * sx + r21 * sy + r22 * sz
        entry_t = proj - jnp.sqrt(jnp.maximum(9.0 - sq_dist, 0.0))
        nx = (gox + gdx * entry_t) * rs_x
        ny = (goy + gdy * entry_t) * rs_y
        nz = (goz + gdz * entry_t) * rs_z
        inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                          1e-24))
        normals = (nx * inv_n, ny * inv_n, nz * inv_n)
    return alpha, hit_t, canonical, normals


def chunk_hits_fast(rec, ray_d, cfg: RasterKernelConfig,
                    need_canonical: bool = False,
                    need_normals: bool = False):
    """Shared-ray-origin fast path: alpha/hitT via three MXU matmuls.

    When every ray shares one origin o (pinhole/fisheye camera, global
    shutter - the training hot path), per particle only the canonical map
    M = diag(1/s) R^T and canonical origin a = M (o - p) are needed; per
    pixel the canonical (unnormalized) direction is b = M d:

        b          (MXU: [256,3] @ [3,K] per component, from M's rows)
        sq_dist  = |a x b|^2 / |b|^2   (canonical perpendicular distance^2)
        hitT     = -(a . b) / |b|^2    (signed max-response distance;
                                        exact for unit world d)
        canonical = a + b * hitT... (in canonical units: a - b (a.b)/|b|^2)

    The cross-product form keeps the same numerical conditioning as the
    reference's canonical-frame math (products of O(|a|) magnitudes, no
    large-square cancellation), unlike the naive g2 - q^2/m expansion.
    ~25 VPU ops per element instead of the ~80 of the general transform.
    """
    def mdot(rows):
        return dot_f32(ray_d, rec[rows:rows + 3, :],
                       (((1,), (0,)), ((), ())))

    if not (need_canonical or need_normals):
        # hot path (constant features): c, b and a.b all ride the MXU
        # against in-kernel-derived per-particle operands (see
        # _fast_operands; separate small matmuls MEASURED faster than
        # one fused [256,16]@[16,5K] call — fwd 14.6 vs 20.6 ms). |b|^2
        # is a sum of squares of the b components (cancellation-safe —
        # see _fast_operands docstring). The acceptance test is a
        # single compare in squared-distance space.
        if cfg.fused_mxu:
            cx, cy, cz, bx, by, bz, q = _fused_hits_mm(rec, ray_d, cfg)
        else:
            n_mat, u_mat = _fast_operands(rec, ray_d)

            def ddot(op, rows0):
                return dot_f32(ray_d, op[rows0:rows0 + 3, :],
                               (((1,), (0,)), ((), ())))

            cx, cy, cz = ddot(n_mat, 0), ddot(n_mat, 3), ddot(n_mat, 6)
            bx, by, bz = mdot(_M), mdot(_M + 3), mdot(_M + 6)
            q = ddot(u_mat, 0)
        m = bx * bx + by * by + bz * bz
        inv_m = 1.0 / jnp.maximum(m, 1e-30)
        sq_dist = (cx * cx + cy * cy + cz * cz) * inv_m
        dens = _row(rec, cfg.density_row)
        if cfg.kernel_degree == 0:
            response = particle_response(sq_dist, 0)
            alpha = _alpha_from_response(response, dens, cfg)
        else:
            thr = _sq_accept_threshold(dens, cfg)
            response = particle_response(sq_dist, cfg.kernel_degree)
            alpha = jnp.where(sq_dist < thr,
                              jnp.minimum(cfg.max_alpha, response * dens),
                              0.0)
        return alpha, -q * inv_m, None, None

    bx = mdot(_M)          # [256,K] = d . M[0,:]
    by = mdot(_M + 3)
    bz = mdot(_M + 6)
    ax, ay, az = _row(rec, _GRO), _row(rec, _GRO + 1), _row(rec, _GRO + 2)

    cx = ay * bz - az * by
    cy = az * bx - ax * bz
    cz = ax * by - ay * bx
    m = bx * bx + by * by + bz * bz
    inv_m = 1.0 / jnp.maximum(m, 1e-30)
    sq_dist = (cx * cx + cy * cy + cz * cz) * inv_m
    response = particle_response(sq_dist, cfg.kernel_degree)
    alpha = _alpha_from_response(response, _row(rec, cfg.density_row), cfg)
    q = ax * bx + ay * by + az * bz
    hit_t = -q * inv_m
    canonical = None
    if need_canonical:
        canonical = (ax + bx * hit_t, ay + by * hit_t, az + bz * hit_t)
    normals = None
    if need_normals:
        # R @ s from M = diag(1/s) R^T alone: s_i^2 = 1/|M row i|^2 and
        # (R s)_j = sum_i M_ij s_i^2 (per-particle rows)
        m0 = rec[_M:_M + 3, :]
        m1 = rec[_M + 3:_M + 6, :]
        m2 = rec[_M + 6:_M + 9, :]
        s2 = [1.0 / jnp.maximum(jnp.sum(mi * mi, axis=0, keepdims=True),
                                1e-24) for mi in (m0, m1, m2)]
        rs = [s2[0] * m0[i:i + 1, :] + s2[1] * m1[i:i + 1, :]
              + s2[2] * m2[i:i + 1, :] for i in range(3)]
        inv_sqm = jax.lax.rsqrt(m)
        # canonical-unit ray: origin a, unit dir b/|b|
        entry_t = -q * inv_sqm - jnp.sqrt(jnp.maximum(9.0 - sq_dist, 0.0))
        nx = (ax + bx * inv_sqm * entry_t) * rs[0]
        ny = (ay + by * inv_sqm * entry_t) * rs[1]
        nz = (az + bz * inv_sqm * entry_t) * rs[2]
        inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                          1e-24))
        normals = (nx * inv_n, ny * inv_n, nz * inv_n)
    return alpha, hit_t, canonical, normals


def chunk_hits_dispatch(rec, ray_o, ray_d, cfg: RasterKernelConfig,
                        need_normals: bool = False):
    need_canonical = cfg.feature_mode == "nht"
    if cfg.shared_origin:
        return chunk_hits_fast(rec, ray_d, cfg,
                               need_canonical=need_canonical,
                               need_normals=need_normals)
    return chunk_hits_general(rec, ray_o, ray_d, cfg,
                              need_canonical=need_canonical,
                              need_normals=need_normals)


# --- NHT feature evaluation ------------------------------------------------
# canonical regular tetrahedron (neuralHarmonicFeaturesParticle.slang:47-66)
_TETRA_EDGE = math.sqrt(24.0)
_TETRA_FACE_IN_R = math.sqrt(2.0)
TETRA_VERTS = (
    (0.5 * _TETRA_EDGE, -_TETRA_FACE_IN_R, -1.0),
    (-0.5 * _TETRA_EDGE, -_TETRA_FACE_IN_R, -1.0),
    (0.0, _TETRA_EDGE * math.sqrt(3.0) / 2.0 - _TETRA_FACE_IN_R, -1.0),
    (0.0, 0.0, 3.0),
)


def _tetra_constants():
    import numpy as np

    v = np.asarray(TETRA_VERTS)
    e1, e2, e3 = v[1] - v[0], v[2] - v[0], v[3] - v[0]
    c23 = np.cross(e2, e3)
    c31 = np.cross(e3, e1)  # for w.z = e1 . (d x e3) = d . (e3 x e1)
    c12 = np.cross(e1, e2)  # for w.w = e1 . (e2 x d) = d . (e1 x e2)... sign
    det = float(np.dot(e1, c23))
    return v[0], c23 / det, np.cross(e3, e1) / det, np.cross(e1, e2) / det


_TETRA_V0, _TETRA_G1, _TETRA_G2, _TETRA_G3 = _tetra_constants()


def tetra_barycentric(cpx, cpy, cpz):
    """Barycentric weights in the canonical tetrahedron for [256,K] points.

    matches barycentricTetrahedronCanonical
    (neuralHarmonicFeaturesParticle.slang:127-138).
    """
    dx = cpx - _TETRA_V0[0]
    dy = cpy - _TETRA_V0[1]
    dz = cpz - _TETRA_V0[2]
    w1 = _TETRA_G1[0] * dx + _TETRA_G1[1] * dy + _TETRA_G1[2] * dz
    w2 = _TETRA_G2[0] * dx + _TETRA_G2[1] * dy + _TETRA_G2[2] * dz
    w3 = _TETRA_G3[0] * dx + _TETRA_G3[1] * dy + _TETRA_G3[2] * dz
    w0 = 1.0 - w1 - w2 - w3
    return w0, w1, w2, w3


def nht_feature_weighted_sum(rec, canonical, w, g_feat_or_none,
                             cfg: RasterKernelConfig):
    """Sum_j w_j * f_j(pixel) per pixel -> [256, F] (and per-dim hit
    features for residuals when requested via callback-style usage).

    f_j = sincos(freq * barycentric-blend of tetra control features at the
    canonical intersection). Implemented dim-by-dim to bound VMEM.
    """
    cpx, cpy, cpz = canonical
    w0, w1, w2, w3 = tetra_barycentric(cpx, cpy, cpz)
    d = cfg.interp_pt_dim
    base = cfg.feat_offset
    outs = []
    for k in range(d):
        b = (w0 * _row(rec, base + k)
             + w1 * _row(rec, base + d + k)
             + w2 * _row(rec, base + 2 * d + k)
             + w3 * _row(rec, base + 3 * d + k))     # [256,K]
        for f in range(cfg.num_frequencies):
            ang = b * float(f + 1)
            outs.append(jnp.sum(w * jnp.sin(ang), axis=1, keepdims=True))
            outs.append(jnp.sum(w * jnp.cos(ang), axis=1, keepdims=True))
    return jnp.concatenate(outs, axis=1)             # [256, F]


def nht_hit_features(rec, canonical, cfg: RasterKernelConfig):
    """Per-(pair, pixel) ray features as a list of F arrays [256,K]."""
    cpx, cpy, cpz = canonical
    w0, w1, w2, w3 = tetra_barycentric(cpx, cpy, cpz)
    d = cfg.interp_pt_dim
    base = cfg.feat_offset
    feats = []
    for k in range(d):
        b = (w0 * _row(rec, base + k)
             + w1 * _row(rec, base + d + k)
             + w2 * _row(rec, base + 2 * d + k)
             + w3 * _row(rec, base + 3 * d + k))
        for f in range(cfg.num_frequencies):
            ang = b * float(f + 1)
            feats.append(jnp.sin(ang))
            feats.append(jnp.cos(ang))
    return feats


# --- per-ray chunk sorting (3DGRT ordering semantics) -----------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _roll_lanes(v, shift):
    """pltpu.roll along lanes with a linear-map VJP (the primitive has no
    differentiation rule; its transpose is the inverse roll)."""
    return pltpu.roll(v, shift, axis=1)


def _roll_lanes_fwd(v, shift):
    return _roll_lanes(v, shift), None


def _roll_lanes_bwd(shift, _, ct):
    k = ct.shape[1]
    return (_roll_lanes(ct, (k - shift) % k),)


_roll_lanes.defvjp(_roll_lanes_fwd, _roll_lanes_bwd)


def _rotl(v, s):
    """Left-rotate along the lane axis: out[i] = v[(i + s) mod K].

    pltpu.roll lowers to the native lane-rotate; the slice+concatenate
    formulation costs a full relayout per call (the bitonic network does
    ~2 rotations x payloads x 36 stages per chunk, so this is hot)."""
    s = s % v.shape[1]
    if s == 0:
        return v
    return _roll_lanes(v, v.shape[1] - s)


def bitonic_sort_by_key(key, payloads, window: Optional[int] = None,
                        return_masks: bool = False):
    """Per-row ascending bitonic sort of `key` [256,K], permuting payloads.

    Lane-XOR partner exchange is expressed with two rotations per stage
    (i^j == i+j when bit j of i is clear, i-j when set). K must be a power
    of two. Differentiable (selects + rotations are linear in payloads).

    ``window`` (power of two <= K) sorts each window-lane group
    independently: stage count drops from log2(K)^2 to log2(W)^2 and the
    XOR partners stay in-group automatically (only bits below log2(W)
    participate). Groups are depth-consecutive candidates, so a W-window
    partition sort is the direct analogue of the reference's W-deep
    k-buffer (gutKBufferRenderer.cuh:62-112, k=16).

    ``return_masks``: also return the per-stage keep_self exchange
    decisions for ``bitonic_replay_unsort`` - the cheap inverse
    permutation (no key movement, no comparisons). Decisions are
    bit-PACKED into int32 words (stage s -> bit s%32 of word s//32):
    keeping 21-36 live [rows,K] stage masks as separate vregs blew the
    16 MB scoped-VMEM limit at the bench shape (compile-time OOM,
    20.3 MB at W=64); one packed word is 32x smaller and the unpack is
    a single shift+and per replayed stage.
    """
    k_total = window or key.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, dimension=1)
    stage_js = []
    packed = []
    cur = None
    k = 2
    while k <= k_total:
        ascending = (lane & k) == 0 if k < k_total else jnp.ones(
            key.shape, bool)
        j = k // 2
        while j >= 1:
            bit_clear = (lane & j) == 0
            key_p = jnp.where(bit_clear, _rotl(key, j), _rotl(key, -j))
            take_min = ascending == bit_clear
            # keep iff (take_min and key<=key_p) or (!take_min and
            # key>=key_p) == sign*(key_p-key) >= 0. Expressed via a float
            # sign select because Mosaic rejects boolean-VALUED selects
            # (vector<i1> truncation) that jnp.where(pred, boolA, boolB)
            # lowers to.
            sign = jnp.where(take_min, 1.0, -1.0)
            keep_self = sign * (key_p - key) >= 0.0
            if return_masks:
                bit = len(stage_js) % 32
                if bit == 0:
                    if cur is not None:
                        packed.append(cur)
                    cur = jnp.zeros(key.shape, jnp.int32)
                bitval = (1 << bit) - (1 << 32 if bit == 31 else 0)
                cur = cur | jnp.where(keep_self, jnp.int32(bitval),
                                      jnp.int32(0))
                stage_js.append(j)
            new_key = jnp.where(keep_self, key, key_p)
            new_payloads = []
            for v in payloads:
                v_p = jnp.where(bit_clear, _rotl(v, j), _rotl(v, -j))
                new_payloads.append(jnp.where(keep_self, v, v_p))
            key, payloads = new_key, new_payloads
            j //= 2
        k *= 2
    if return_masks:
        if cur is not None:
            packed.append(cur)
        return key, payloads, (packed, stage_js)
    return key, payloads


def bitonic_replay_unsort(masks, payloads):
    """Invert a recorded bitonic permutation on ``payloads``.

    Each compare-exchange stage swaps disjoint lane pairs (keep_self is
    pairwise-consistent), so the stage is an involution: replaying the
    SAME exchange undoes it. Applying the recorded stages in reverse
    order therefore restores original lane order at ~1/3 the cost of a
    second index-keyed sort (no key rotations, no comparisons, and one
    payload instead of payload+key). ``masks`` is the bit-packed
    (words, stage_js) pair from ``bitonic_sort_by_key``."""
    packed, stage_js = masks
    if not stage_js:
        return list(payloads)
    lane = jax.lax.broadcasted_iota(jnp.int32, packed[0].shape,
                                    dimension=1)
    payloads = list(payloads)
    for idx in reversed(range(len(stage_js))):
        j = stage_js[idx]
        keep_self = ((packed[idx // 32] >> (idx % 32)) & 1) == 1
        bit_clear = (lane & j) == 0
        payloads = [
            jnp.where(keep_self, v,
                      jnp.where(bit_clear, _rotl(v, j), _rotl(v, -j)))
            for v in payloads]
    return payloads


# --- prefix scans along the candidate (lane) axis ---------------------------

def _prefix_product_excl(x):
    # slice+concat beats roll+select here (measured 17.07 vs 16.75 it/s
    # end to end): the compiler folds the shifted concat into the multiply
    k = x.shape[1]
    ones = jnp.ones_like(x[:, :1])
    y = jnp.concatenate([ones, x[:, :-1]], axis=1)
    s = 1
    while s < k:
        shifted = jnp.concatenate([jnp.ones_like(y[:, :s]), y[:, :-s]],
                                  axis=1)
        y = y * shifted
        s *= 2
    return y


def _prefix_product_excl_mxu(x):
    # exclusive prefix product as exp(cumsum_excl(log x)), with the
    # exclusive cumsum done in ONE dot against a strict-lower-triangular
    # [K,K] mask (in (j, i) orientation: j < i contributes to lane i).
    # x = 1 - alpha >= 0.01 for live lanes (alpha is clamped to 0.99)
    # and exactly 1.0 for masked lanes, so log is well-conditioned; the
    # 1e-30 floor only guards hypothetical alpha == 1 inputs.
    k = x.shape[1]
    logx = jnp.log(jnp.maximum(x, 1e-30))
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (rows < cols).astype(jnp.float32)
    s = dot_f32(logx, tri, (((1,), (0,)), ((), ())), exact_rhs=True)
    return jnp.exp(s)


def _prefix_excl(x, cfg):
    """Exclusive prefix product of ``x`` along lanes, variant per cfg."""
    if cfg.scan_mxu:
        return _prefix_product_excl_mxu(x)
    return _prefix_product_excl(x)


def _cumsum_incl(x):
    k = x.shape[1]
    y = x
    s = 1
    while s < k:
        shifted = jnp.concatenate([jnp.zeros_like(y[:, :s]), y[:, :-s]],
                                  axis=1)
        y = y + shifted
        s *= 2
    return y


def _cumsum_incl_mxu(x):
    # inclusive cumsum as one dot against an inclusive lower-triangular
    # mask (j <= i contributes to lane i); Precision.HIGHEST keeps the
    # suffix reformulation f32-exact (same argument as the prefix
    # product above)
    k = x.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (rows <= cols).astype(jnp.float32)
    return dot_f32(x, tri, (((1,), (0,)), ((), ())), exact_rhs=True)


def _cumsum(x, cfg):
    """Inclusive lane cumsum, variant per cfg (rides the scan_mxu knob:
    both scans live in the same kernel bodies and win or lose
    together)."""
    if cfg.scan_mxu:
        return _cumsum_incl_mxu(x)
    return _cumsum_incl(x)


def _chunk_composite(rec, ray_o, ray_d, tmin, tmax, t_in,
                     cfg: RasterKernelConfig, lane_mask=None,
                     need_normals: bool = False,
                     unsort_w: bool = False):
    """One chunk of front-to-back compositing (pixel-major layout).

    ``lane_mask`` [1,K] masks candidates outside the tile's raw
    [start, end) range (boundary chunks are shared between tiles).
    Returns (w, alpha_eff, hit_t, t_prev [256,K], t_out [256,1], canonical,
    hit_feats, normals): hit_feats is the per-(pair, pixel) feature list
    when the chunk was re-sorted per ray (3DGRT) - downstream must then
    use the sorted feature arrays instead of the record rows.

    ``unsort_w`` (forward kernels only): every downstream accumulation
    (features, depth, hits, normals, weight telemetry) is a weighted sum
    - permutation-invariant - so only the transmittance chain needs the
    sorted domain. Sort just [alpha, lane-index], composite, and permute
    w back: ``w`` comes back in ORIGINAL lane order (lanes = pair
    identity, which the telemetry kernel requires), hit_feats stays None
    (the cheaper unsorted feature matmul applies), and the sort network
    carries 2 payloads instead of 2+F(+3).
    """
    alpha, hit_t, canonical, normals = chunk_hits_dispatch(
        rec, ray_o, ray_d, cfg, need_normals=need_normals)
    in_range = (hit_t > tmin) & (hit_t < tmax)
    if lane_mask is not None:
        in_range = in_range & lane_mask
    alpha = jnp.where(in_range, alpha, 0.0)

    if cfg.sorted_compositing and unsort_w:
        if cfg.feature_mode != "constant":
            raise NotImplementedError("sorted compositing requires "
                                      "per-particle (constant) features")
        # sort only alpha (recording the exchange masks), composite in
        # depth order, then mask-replay the network in reverse to bring
        # w back to original lane order - no index payload in the sort
        # and no key work in the unsort
        def _composite_sorted(alpha):
            key = jnp.where(alpha > 0.0, hit_t, jnp.float32(3.0e38))
            _, (a_s,), masks = bitonic_sort_by_key(
                key, [alpha], window=cfg.sort_window, return_masks=True)
            prefix = _prefix_excl(1.0 - a_s, cfg)
            t_prev = t_in * prefix
            if cfg.exact_kill:
                alive = t_prev >= cfg.min_transmittance
                alpha_eff = jnp.where(alive, a_s, 0.0)
                w_s = alpha_eff * t_prev
                dead_vals = jnp.where(alive, -1.0, t_prev)
                t_frozen = jnp.max(dead_vals, axis=1, keepdims=True)
                t_raw_end = t_prev[:, -1:] * (1.0 - a_s[:, -1:])
                t_out = jnp.where(t_frozen >= 0.0, t_frozen, t_raw_end)
            else:
                alpha_eff = a_s
                w_s = a_s * t_prev
                t_out = t_prev[:, -1:] * (1.0 - a_s[:, -1:])
            (w_u,) = bitonic_replay_unsort(masks, [w_s])
            return w_u, alpha_eff, t_prev, t_out

        if cfg.sort_skip_dead:
            # all-dead visits contribute w == 0 and leave T unchanged:
            # skip the sort network + scans behind one scalar branch
            def _dead(alpha):
                z = jnp.zeros_like(alpha)
                return z, z, jnp.broadcast_to(t_in, alpha.shape), t_in
            w_u, alpha_eff, t_prev, t_out = jax.lax.cond(
                jnp.max(alpha) > 0.0, _composite_sorted, _dead, alpha)
        else:
            w_u, alpha_eff, t_prev, t_out = _composite_sorted(alpha)
        return (w_u, alpha_eff, hit_t, t_prev, t_out, canonical, None,
                normals)

    hit_feats = None
    if cfg.sorted_compositing:
        # per-ray depth ordering within the chunk (3DGRT tracing
        # semantics; reference k-buffer gutKBufferRenderer.cuh:62-112)
        if cfg.feature_mode != "constant":
            raise NotImplementedError("sorted compositing requires "
                                      "per-particle (constant) features")
        feats = [jnp.broadcast_to(_row(rec, cfg.feat_offset + c),
                                  alpha.shape)
                 for c in range(cfg.feat_dim)]
        norm_list = list(normals) if normals is not None else []
        key = jnp.where(alpha > 0.0, hit_t, jnp.float32(3.0e38))
        _, sorted_payloads = bitonic_sort_by_key(
            key, [alpha, hit_t] + feats + norm_list,
            window=cfg.sort_window)
        alpha, hit_t = sorted_payloads[0], sorted_payloads[1]
        hit_feats = sorted_payloads[2:2 + cfg.feat_dim]
        if normals is not None:
            normals = tuple(sorted_payloads[2 + cfg.feat_dim:])

    # single exclusive prefix product; the "kill" (ray dead once T drops
    # below the threshold) freeze is recovered without a second scan:
    # since raw T only decreases, the frozen T equals raw T_prev at the
    # first dead index = the max of T_prev over dead indices.
    prefix = _prefix_excl(1.0 - alpha, cfg)        # [256,K]
    t_prev = t_in * prefix                            # raw T before hit j
    if cfg.exact_kill:
        alive = t_prev >= cfg.min_transmittance       # kill semantics
        alpha_eff = jnp.where(alive, alpha, 0.0)
        w = alpha_eff * t_prev                        # == eff w while alive
        dead_vals = jnp.where(alive, -1.0, t_prev)
        t_frozen = jnp.max(dead_vals, axis=1, keepdims=True)
        t_raw_end = t_prev[:, -1:] * (1.0 - alpha[:, -1:])
        any_dead = t_frozen >= 0.0
        t_out = jnp.where(any_dead, t_frozen, t_raw_end)
    else:
        alpha_eff = alpha
        w = alpha * t_prev
        t_out = t_prev[:, -1:] * (1.0 - alpha[:, -1:])
    return w, alpha_eff, hit_t, t_prev, t_out, canonical, hit_feats, normals


def _accumulate_features(rec, w, canonical, hit_feats,
                         cfg: RasterKernelConfig):
    """Sum_j w_j f_j -> [256, F]."""
    if hit_feats is not None:  # sorted path: per-pixel feature order
        return jnp.concatenate(
            [jnp.sum(w * f, axis=1, keepdims=True) for f in hit_feats],
            axis=1)
    if cfg.feature_mode == "constant":
        feats = jnp.transpose(
            rec[cfg.feat_offset:cfg.feat_offset + cfg.feat_dim, :])  # [K,F]
        return dot_f32(w, feats, (((1,), (0,)), ((), ())))
    return nht_feature_weighted_sum(rec, canonical, w, None, cfg)


# ---------------------------------------------------------------------------
# chunk-residency DMA machinery (shared by the strip kernels)
# ---------------------------------------------------------------------------
#
# Tiles are processed in strips of STRIP consecutive tiles per grid
# program; consecutive tiles own adjacent raw [start, end) segments of
# the tile-sorted pair list, so a tile's first chunk is usually the
# previous tile's last chunk. Chunk DMAs target the parity slot
# (global_chunk_id % 2) and two SMEM scalars per slot track which chunk
# is resident / in flight, so shared boundary chunks are never
# re-fetched. The SMEM state (and VMEM chunk buffer) persists across
# sequential grid steps on TPU, which also makes the prefetch of the
# next strip's first chunk free.


def _mk_chunk_fetch(records_hbm, chunk_buf, sem, res_ref, inf_ref):
    """Residency-tracked double-buffered chunk reader.

    res_ref/inf_ref: SMEM (2,) int32 — global chunk id resident in /
    in flight toward each parity slot, -1 when none.
    """

    def dma(slot, g):
        return pltpu.make_async_copy(records_hbm.at[g], chunk_buf.at[slot],
                                     sem.at[slot])

    def start_fetch(g):
        slot = jax.lax.rem(g, 2)
        pending = inf_ref[slot]

        # retire a stale in-flight DMA before reusing the slot
        @pl.when((pending >= 0) & (pending != g))
        def _():
            dma(slot, pending).wait()
            res_ref[slot] = pending
            inf_ref[slot] = -1

        @pl.when((res_ref[slot] != g) & (inf_ref[slot] != g))
        def _():
            dma(slot, g).start()
            inf_ref[slot] = g

    def wait_ready(g):
        slot = jax.lax.rem(g, 2)

        @pl.when(inf_ref[slot] == g)
        def _():
            dma(slot, g).wait()
            res_ref[slot] = g
            inf_ref[slot] = -1

    def prefetch(base, last):
        del last  # depth-1 scheme
        start_fetch(base)

    def drain():
        for slot in range(2):
            pending = inf_ref[slot]

            @pl.when(pending >= 0)
            def _():
                dma(slot, pending).wait()
                res_ref[slot] = pending
                inf_ref[slot] = -1

    return prefetch, wait_ready, drain


# chunk-ring prefetch: slots and lookahead depth of the monotone reader
RING = 4
DEPTH = 2


def _mk_chunk_fetch_mono(records_hbm, chunk_buf, sem, st_ref):
    """Monotone-stream chunk reader with depth-2 lookahead.

    Tile segments are ordered, so the stream of DISTINCT chunk ids each
    strip chain touches is nondecreasing (the only revisit is a tile's
    first chunk equalling the previous tile's last — already resident,
    and jumps past skipped chunks only happen at tile boundaries / early
    exits). Two SMEM scalars replace the 2x2 residency table: st_ref[0]
    = highest chunk STARTED, st_ref[1] = highest chunk WAITED; chunk g
    lives in ring slot g % RING. Keeping DEPTH=2 chunks in flight hides
    the full HBM->VMEM latency behind two visits' compute (depth-1
    pipelining leaves max(DMA, compute) per visit — the round-4 profile
    showed every compute-side cut disappearing under the DMA wait).

    prefetch(base, last): ensure chunks [base, min(base+DEPTH-1+..,
    last)] are started; a gap (base > started+1) retires outstanding
    DMAs and rebases the window. wait_ready(g): block until chunk g
    landed. Slot-reuse safety: starts are capped at DEPTH outstanding,
    and RING > DEPTH guarantees a slot's previous occupant was waited
    before reuse.
    """

    def dma(g):
        slot = jax.lax.rem(g, RING)
        return pltpu.make_async_copy(records_hbm.at[g], chunk_buf.at[slot],
                                     sem.at[slot])

    def prefetch(base, last):
        # gap: retire the (<= DEPTH) outstanding DMAs, rebase the window
        @pl.when(base > st_ref[0] + 1)
        def _():
            for _ in range(DEPTH):
                @pl.when(st_ref[1] < st_ref[0])
                def _():
                    nw = st_ref[1] + 1
                    dma(nw).wait()
                    st_ref[1] = nw

            st_ref[0] = base - 1
            st_ref[1] = base - 1

        hi = jnp.minimum(base + (DEPTH - 1), last)
        for _ in range(DEPTH):
            @pl.when((st_ref[0] < hi) & (st_ref[0] - st_ref[1] < DEPTH))
            def _():
                nxt = st_ref[0] + 1
                dma(nxt).start()
                st_ref[0] = nxt

    def wait_ready(g):
        # retire sequentially up to g: skipping an outstanding chunk's
        # semaphore (early-exit jumps) would leave a stale signal on a
        # reused ring slot
        for _ in range(DEPTH):
            @pl.when(st_ref[1] < g)
            def _():
                nw = st_ref[1] + 1
                dma(nw).wait()
                st_ref[1] = nw

    def drain():
        for _ in range(DEPTH):
            @pl.when(st_ref[1] < st_ref[0])
            def _():
                nw = st_ref[1] + 1
                dma(nw).wait()
                st_ref[1] = nw

    return prefetch, wait_ready, drain


def _prefetch_next_tile(t, tp, tile_start_ref, tile_count_ref, prefetch):
    """Start the DMA(s) for tile t+1's first chunks (if any) while the
    current tile's outputs are written — hides the first-chunk latency
    that a fresh tile would otherwise expose."""
    @pl.when(t + 1 < tp)
    def _():
        nstart = tile_start_ref[t + 1]
        ncount = tile_count_ref[t + 1]

        @pl.when(ncount > 0)
        def _():
            nfirst = nstart // CHUNK
            nlast = (nstart + ncount + CHUNK - 1) // CHUNK - 1
            prefetch(nfirst, nlast)


# ---------------------------------------------------------------------------
# forward kernel (strip-of-tiles per program)
# ---------------------------------------------------------------------------

def _fwd_strip_kernel(tile_start_ref, tile_count_ref, records_hbm, rays_ref,
                      out_ref, chunk_buf, sem, res_ref, inf_ref, *,
                      cfg: RasterKernelConfig, strip: int, tp: int):
    prog = pl.program_id(0)

    @pl.when(prog == 0)
    def _():
        for slot in range(2):
            res_ref[slot] = -1
            inf_ref[slot] = -1

    if cfg.shared_segments:
        # trace(): every tile rescans the same chunk range, so the
        # stream of chunk ids is NOT monotone - keep residency tracking
        prefetch, wait_ready, drain = _mk_chunk_fetch(
            records_hbm, chunk_buf, sem, res_ref, inf_ref)
    else:
        prefetch, wait_ready, drain = _mk_chunk_fetch_mono(
            records_hbm, chunk_buf, sem, res_ref)
    slot_mod = 2 if cfg.shared_segments else RING
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    f = cfg.feat_dim

    def tile_body(s, _):
        t = prog * strip + s
        start = tile_start_ref[t]
        end = start + tile_count_ref[t]
        first = start // CHUNK
        nchunks = jnp.where(end > start,
                            (end + CHUNK - 1) // CHUNK - first, 0)

        ray_o = rays_ref[s, :, 0:3]
        ray_d = rays_ref[s, :, 3:6]
        tmin = rays_ref[s, :, 6:7]
        tmax = rays_ref[s, :, 7:8]

        last = first + nchunks - 1

        @pl.when(nchunks > 0)
        def _():
            prefetch(first, last)

        def cond(state):
            i, t_cur = state[0], state[1]
            if not cfg.early_exit:
                return i < nchunks
            return (i < nchunks) & (jnp.max(t_cur) >= cfg.min_transmittance)

        def body(state):
            i, t_cur, acc3, nacc = state
            g = first + i

            # wait g BEFORE issuing: advancing the waited watermark first
            # opens the depth-2 window (issue g+2 while g+1 is in flight)
            wait_ready(g)

            @pl.when(i + 1 < nchunks)
            def _():
                prefetch(g + 1, last)

            rec = chunk_buf[jax.lax.rem(g, slot_mod)]
            if cfg.records_bf16:
                rec = rec.astype(jnp.float32)
            g0 = g * CHUNK
            lane_mask = (lane + g0 >= start) & (lane + g0 < end)
            t_out, acc3, nacc = _fwd_visit(
                rec, ray_o, ray_d, tmin, tmax, t_cur, acc3, nacc,
                lane_mask, cfg)
            return i + 1, t_out, acc3, nacc

        n_cols = 3 if cfg.compute_normals else 1  # dummy col when disabled
        init = (jnp.asarray(0, jnp.int32),
                jnp.ones((TILE_PIX, 1), jnp.float32),
                jnp.zeros((TILE_PIX, cfg.feat_dim + 2), jnp.float32),
                jnp.zeros((TILE_PIX, n_cols), jnp.float32))
        _, t_fin, acc3, nacc = jax.lax.while_loop(cond, body, init)
        feat = acc3[:, 0:f]
        depth = acc3[:, f:f + 1]
        hits = acc3[:, f + 1:f + 2]
        # no early-exit drain: an in-flight prefetch stays tracked in
        # inf_ref and is retired by the next start_fetch or the final
        # drain()

        _prefetch_next_tile(t, tp, tile_start_ref, tile_count_ref,
                            prefetch)

        # one store per tile: lane-concatenate the output fields (5-7
        # narrow stores per tile measurably contribute to the ~1.2 us
        # per-tile floor, round-4 zero-work probe)
        pieces = [feat, 1.0 - t_fin, depth, hits, t_fin]
        base = f + 4
        if cfg.compute_normals:
            pieces.append(nacc)
            base += 3
        pad = cfg.out_dim - base
        if pad > 0:
            pieces.append(jnp.zeros((TILE_PIX, pad), jnp.float32))
        out_ref[s] = jnp.concatenate(pieces, axis=1)
        return 0

    jax.lax.fori_loop(0, strip, tile_body, 0)
    # keep DMAs tracked across programs (scratch + semaphores persist on
    # the sequential TPU grid); the final program drains everything
    @pl.when(prog == pl.num_programs(0) - 1)
    def _():
        drain()



def _fwd_visit(rec, ray_o, ray_d, tmin, tmax, t_cur, acc3, nacc,
               lane_mask, cfg: RasterKernelConfig):
    """One forward chunk visit: composite + accumulate.

    acc3 holds [features(F) | depth | hits]; returns (t_out, acc3, nacc).
    Shared by the strip kernel's inner loop and the flat visit-grid
    kernel so both compile the identical math."""
    f = cfg.feat_dim
    (w, _, hit_t, _, t_out, canonical, hit_feats,
     normals) = _chunk_composite(
        rec, ray_o, ray_d, tmin, tmax, t_cur, cfg, lane_mask,
        need_normals=cfg.compute_normals,
        unsort_w=cfg.feature_mode == "constant")
    if (cfg.feature_mode == "constant" and hit_feats is None
            and not cfg.compute_normals):
        # one [256,3K] @ [3K,F+2] matmul accumulates features AND the
        # depth/hits lane reductions (two per-chunk 7-stage shift-add
        # reductions were ~30% of the fwd chunk op count, round-4
        # profile). RHS blocks: rows 0..K-1 = per-particle features,
        # rows K.. = a ones column for depth, rows 2K.. = one for hits.
        k = w.shape[1]
        feats_kf = jnp.transpose(
            rec[cfg.feat_offset:cfg.feat_offset + f, :])          # [K,F]
        cols = jax.lax.broadcasted_iota(jnp.int32, (k, f + 2), 1)
        featsp = jnp.concatenate(
            [feats_kf, jnp.zeros((k, 2), jnp.float32)], axis=1)
        dcol = jnp.where(cols == f, 1.0, 0.0)
        hcol = jnp.where(cols == f + 1, 1.0, 0.0)
        rhs = jnp.concatenate([featsp, dcol, hcol], axis=0)
        lhs = jnp.concatenate(
            [w, w * hit_t, jnp.where(w > 0.0, 1.0, 0.0)], axis=1)
        acc3 = acc3 + dot_f32(lhs, rhs, (((1,), (0,)), ((), ())))
    else:
        feat = acc3[:, 0:f] + _accumulate_features(
            rec, w, canonical, hit_feats, cfg)
        depth = acc3[:, f:f + 1] + jnp.sum(w * hit_t, axis=1,
                                           keepdims=True)
        hits = acc3[:, f + 1:f + 2] + jnp.sum(
            (w > 0.0).astype(jnp.float32), axis=1, keepdims=True)
        acc3 = jnp.concatenate([feat, depth, hits], axis=1)
    if cfg.compute_normals:
        nacc = nacc + jnp.concatenate(
            [jnp.sum(w * nc, axis=1, keepdims=True)
             for nc in normals], axis=1)
    return t_out, acc3, nacc


def _assemble_out(t_fin, acc3, nacc, cfg: RasterKernelConfig):
    """Lane-concatenate the per-tile output fields -> [256, out_dim]."""
    f = cfg.feat_dim
    pieces = [acc3[:, 0:f], 1.0 - t_fin, acc3[:, f:f + 1],
              acc3[:, f + 1:f + 2], t_fin]
    base = f + 4
    if cfg.compute_normals:
        pieces.append(nacc)
        base += 3
    pad = cfg.out_dim - base
    if pad > 0:
        pieces.append(jnp.zeros((TILE_PIX, pad), jnp.float32))
    return jnp.concatenate(pieces, axis=1)


# ---------------------------------------------------------------------------
# flat visit-grid kernels: one grid step per (tile, chunk) visit
# ---------------------------------------------------------------------------
#
# The strip kernels drive the chunk walk with an in-kernel while_loop and
# hand-rolled DMA bookkeeping; their per-visit scalar machinery measured
# ~0.7 us/visit on chip (round-4 battery) and resisted every compute-side
# optimization. The flat kernels instead put one visit per GRID STEP:
# records chunks, ray tiles and output tiles are routed through
# prefetch-scalar index maps, and Mosaic's native block pipeline performs
# the chunk prefetching (a bare flat grid step measures ~3 ns). Per-tile
# compositing state (transmittance + accumulators) persists in a VMEM
# scratch across the tile's consecutive visits; per-chunk gradients
# accumulate in the revisited output block (boundary chunks are visited
# by consecutive tiles, so the block index repeats and Mosaic keeps the
# buffer resident).


def _fwd_flat_kernel(vt_ref, vc_ref, vf_ref, ts_ref, tc_ref, rec_ref,
                     rays_ref, out_ref, st_ref, *,
                     cfg: RasterKernelConfig, st_w: int):
    v = pl.program_id(0)
    t = vt_ref[v]
    g = vc_ref[v]
    flags = vf_ref[v]
    f = cfg.feat_dim
    start = ts_ref[t]
    end = start + tc_ref[t]

    rec = rec_ref[0]
    if cfg.records_bf16:
        rec = rec.astype(jnp.float32)
    rays = rays_ref[0]
    ray_o = rays[:, 0:3]
    ray_d = rays[:, 3:6]
    tmin = rays[:, 6:7]
    tmax = rays[:, 7:8]

    @pl.when((flags & 1) == 1)  # first visit of this tile: reset state
    def _():
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, st_w), 1)
        st_ref[:, :] = jnp.where(cols == 0, 1.0, 0.0)   # col 0 = T

    t_cur = st_ref[:, 0:1]
    acc3 = st_ref[:, 1:1 + f + 2]
    n_cols = 3 if cfg.compute_normals else 1
    nacc = st_ref[:, 1 + f + 2:1 + f + 2 + n_cols]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    g0 = g * CHUNK
    lane_mask = (lane + g0 >= start) & (lane + g0 < end)
    t_out, acc3, nacc = _fwd_visit(rec, ray_o, ray_d, tmin, tmax, t_cur,
                                   acc3, nacc, lane_mask, cfg)
    pad = st_w - (1 + f + 2 + n_cols)
    st_ref[:, :] = jnp.concatenate(
        [t_out, acc3, nacc]
        + ([jnp.zeros((TILE_PIX, pad), jnp.float32)] if pad else []),
        axis=1)

    @pl.when((flags & 2) == 2)  # last visit of this tile: flush outputs
    def _():
        out_ref[0] = _assemble_out(t_out, acc3, nacc, cfg)


def _bwd_flat_kernel(vt_ref, vc_ref, vf_ref, ts_ref, tc_ref, rec_ref,
                     rays_ref, fwd_ref, gout_ref, dgrad_ref, st_ref, *,
                     cfg: RasterKernelConfig):
    v = pl.program_id(0)
    t = vt_ref[v]
    g = vc_ref[v]
    flags = vf_ref[v]
    f = cfg.feat_dim
    start = ts_ref[t]
    end = start + tc_ref[t]

    rec = rec_ref[0]
    if cfg.records_bf16:
        rec = rec.astype(jnp.float32)
    rays = rays_ref[0]
    ray_o = rays[:, 0:3]
    ray_d = rays[:, 3:6]
    tmin = rays[:, 6:7]
    tmax = rays[:, 7:8]

    fwd_out = fwd_ref[0]
    gout = gout_ref[0]
    feat_total = fwd_out[:, 0:f]
    depth_total = fwd_out[:, f + 1:f + 2]
    t_final = fwd_out[:, f + 3:f + 4]
    g_feat = gout[:, 0:f]
    g_t = gout[:, f + 3:f + 4] - gout[:, f:f + 1]
    g_depth = gout[:, f + 1:f + 2]

    @pl.when((flags & 1) == 1)  # first visit of tile: reset + phi_total
    def _():
        phi_total = (jnp.sum(g_feat * feat_total, axis=1, keepdims=True)
                     + g_depth * depth_total)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 8), 1)
        st_ref[:, :] = jnp.where(
            cols == 0, 1.0,
            jnp.where(cols == 2, jnp.broadcast_to(phi_total,
                                                  (TILE_PIX, 8)), 0.0))

    t_cur = st_ref[:, 0:1]
    phi_acc = st_ref[:, 1:2]
    phi_total = st_ref[:, 2:3]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    g0 = g * CHUNK
    lane_mask = (lane + g0 >= start) & (lane + g0 < end)
    d_rec, t_out, psi_sum = _bwd_chunk_grads(
        rec, ray_o, ray_d, tmin, tmax, t_cur, phi_total - phi_acc,
        t_final, g_feat, g_t, g_depth, lane_mask, cfg)
    st_ref[:, :] = jnp.concatenate(
        [t_out, phi_acc + psi_sum, phi_total,
         jnp.zeros((TILE_PIX, 5), jnp.float32)], axis=1)

    # accumulate into the (revisited) chunk gradient block: boundary
    # chunks are visited by consecutive tiles -> same block index on
    # consecutive steps, so the buffer persists between them
    cur = dgrad_ref[0]
    dgrad_ref[0] = jnp.where((flags & 4) == 4, d_rec, cur + d_rec)


def _visit_tables(tile_start, tile_count, n_chunks):
    """Visit tables for the flat grid.

    Every tile gets max(nchunks, 1) consecutive visits (empty tiles get
    one zero-work visit so their output tile is still written); trailing
    padding visits map to dummy tile T / dummy gradient chunk n_chunks.
    Returns (vt, vc, vflags): tile id, chunk id, flag bits
    (1 = first visit of tile, 2 = last visit of tile, 4 = first visit of
    this gradient chunk).
    """
    t = tile_start.shape[0]
    first = tile_start // CHUNK
    endp = tile_start + tile_count
    nch = jnp.where(tile_count > 0,
                    (endp + CHUNK - 1) // CHUNK - first, 0)
    n_v = jnp.maximum(nch, 1)
    vstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(n_v).astype(jnp.int32)])
    v_pad = ((n_chunks + t + 1 + 7) // 8) * 8
    vi = jnp.arange(v_pad, dtype=jnp.int32)
    t_of = jnp.clip(
        jnp.searchsorted(vstart, vi, side="right",
                         method="scan_unrolled").astype(jnp.int32) - 1,
        0, t)
    local = vi - vstart[t_of]
    t_real = jnp.minimum(t_of, t - 1)
    g_of = jnp.where(t_of < t, first[t_real] + local, n_chunks)
    prev_t = jnp.concatenate([jnp.full(1, -1, jnp.int32), t_of[:-1]])
    next_t = jnp.concatenate([t_of[1:], jnp.full(1, -2, jnp.int32)])
    prev_g = jnp.concatenate([jnp.full(1, -1, jnp.int32), g_of[:-1]])
    flags = ((t_of != prev_t).astype(jnp.int32)
             + 2 * (t_of != next_t).astype(jnp.int32)
             + 4 * (g_of != prev_g).astype(jnp.int32))
    return t_of, g_of, flags


def _flat_forward(records, tile_start, tile_count, rays, cfg, interpret):
    num_tiles = rays.shape[0]
    n_chunks = records.shape[0]
    if cfg.records_bf16:
        records = records.astype(jnp.bfloat16)
    vt, vc, vflags = _visit_tables(tile_start, tile_count, n_chunks)
    vc_rec = jnp.minimum(vc, n_chunks - 1)      # dummy visits fetch safely
    ts_ext = jnp.concatenate([tile_start, jnp.zeros(1, jnp.int32)])
    tc_ext = jnp.concatenate([tile_count, jnp.zeros(1, jnp.int32)])
    n_cols = 3 if cfg.compute_normals else 1
    st_w = ((1 + cfg.feat_dim + 2 + n_cols + 7) // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(vt.shape[0],),
        in_specs=[
            pl.BlockSpec((1, cfg.record_dim, CHUNK),
                         lambda v, vt, vc, vf, ts, tc: (vc[v], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIX, 8),
                         lambda v, vt, vc, vf, ts, tc: (
                             jnp.minimum(vt[v], num_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_PIX, cfg.out_dim),
                               lambda v, vt, vc, vf, ts, tc: (vt[v], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE_PIX, st_w), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_flat_kernel, cfg=cfg, st_w=st_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, TILE_PIX,
                                        cfg.out_dim), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 << 20)) if cfg.sorted_compositing
        else None,
    )(vt, vc_rec, vflags, ts_ext, tc_ext, records, rays)
    return out[:num_tiles]


def _flat_backward(records, tile_start, tile_count, rays, fwd_out,
                   grad_out, cfg, interpret):
    num_tiles = rays.shape[0]
    n_chunks = records.shape[0]
    if cfg.records_bf16:
        records = records.astype(jnp.bfloat16)
    vt, vc, vflags = _visit_tables(tile_start, tile_count, n_chunks)
    vc_rec = jnp.minimum(vc, n_chunks - 1)
    ts_ext = jnp.concatenate([tile_start, jnp.zeros(1, jnp.int32)])
    tc_ext = jnp.concatenate([tile_count, jnp.zeros(1, jnp.int32)])

    def tile_idx(v, vt, vc, vf, ts, tc):
        return (jnp.minimum(vt[v], num_tiles - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(vt.shape[0],),
        in_specs=[
            pl.BlockSpec((1, cfg.record_dim, CHUNK),
                         lambda v, vt, vc, vf, ts, tc: (vc[v], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIX, 8), tile_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIX, cfg.out_dim), tile_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIX, cfg.out_dim), tile_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cfg.record_dim, CHUNK),
                               lambda v, vt, vc, vf, ts, tc: (vc[v], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE_PIX, 8), jnp.float32)],
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_flat_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks + 1, cfg.record_dim,
                                        CHUNK), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(64 << 20) if (
                cfg.sorted_compositing
                and not (cfg.shared_origin
                         and cfg.feature_mode == "constant"))
            else (32 << 20)),
    )(vt, vc, vflags, ts_ext, tc_ext, records, rays, fwd_out, grad_out)
    return grads[:n_chunks]


def _suffix_cotangents(w, hit_t, t_prev, alpha_eff, hit_feats, phi_rem,
                       t_final, g_feat, g_t, g_depth,
                       cfg: RasterKernelConfig):
    """g_alpha / g_hit_t via the single-suffix-sum reformulation.

    The reference's per-channel residual formulation
    (gaussianParticles.cuh:543-612) needs one prefix sum per feature
    channel plus depth, each clamped at zero. Mathematically the clamps
    are no-ops when the residual is computed as a direct suffix sum:
    per-channel S_c[j] = sum_{k>j} w_k f_ck is non-negative whenever the
    features are (clamped SH), and the depth suffix is non-negative
    because accepted hits satisfy hit_t > tmin >= 0. All channels then
    collapse into ONE suffix sum of the contracted scalar
    psi = w * (<g_feat, f> + g_depth * hitT):

        dC/dalpha_j = T_j * u_j - S_excl[j] / (1 - alpha_j),
        dT_fin/dalpha_j = -T_fin / (1 - alpha_j).

    ``phi_rem`` [256,1] is sum_{k >= this chunk} psi_k (the running
    remainder of the per-pixel total, maintained across chunks).
    Returns (g_alpha, g_hit_t, psi_sum [256,1]).
    """
    phi = jnp.zeros_like(w)
    for c in range(cfg.feat_dim):
        phi = phi + g_feat[:, c:c + 1] * hit_feats[c]
    u = phi + g_depth * hit_t
    psi = w * u
    csum = _cumsum(psi, cfg)
    psi_sum = csum[:, -1:]
    suffix = phi_rem - csum                       # S_excl[j], exact in f32
    active = w > 0.0
    inv_1ma = 1.0 / jnp.maximum(1.0 - alpha_eff, 1e-6)
    g_alpha = jnp.where(
        active, t_prev * u - (suffix + g_t * t_final) * inv_1ma, 0.0)
    g_hit_t = jnp.where(active, g_depth * w, 0.0)
    return g_alpha, g_hit_t, psi_sum


def _rows16_put(acc, rows_iota, r0, piece_1k):
    """Place a [1,K] row at sublane r0 of acc (Mosaic-safe: no (1,K)
    concatenates)."""
    return jnp.where(rows_iota == r0,
                     jnp.broadcast_to(piece_1k, acc.shape), acc)


def _fast_fwd_vals(rec, ray_d, cfg: RasterKernelConfig):
    """chunk_hits_fast MXU path inlined to expose intermediates for the
    hand-derived backward passes."""
    if cfg.fused_mxu_bwd:
        cx, cy, cz, bx, by, bz, q = _fused_hits_mm(rec, ray_d, cfg)
    else:
        n_mat, u_mat = _fast_operands(rec, ray_d)

        def ddot(op, rows0):
            return dot_f32(ray_d, op[rows0:rows0 + 3, :],
                           (((1,), (0,)), ((), ())))

        cx, cy, cz = ddot(n_mat, 0), ddot(n_mat, 3), ddot(n_mat, 6)
        # b = M d componentwise; m = |b|^2 as a sum of squares (NEVER
        # the p6 monomial expansion — see _fast_operands)
        bx, by, bz = ddot(rec, _M), ddot(rec, _M + 3), ddot(rec, _M + 6)
        q = ddot(u_mat, 0)
    m = bx * bx + by * by + bz * bz
    inv_m = 1.0 / jnp.maximum(m, 1e-30)
    c2 = cx * cx + cy * cy + cz * cz
    sq = c2 * inv_m
    resp = particle_response(sq, cfg.kernel_degree)
    dens = _row(rec, cfg.density_row)
    alpha_raw = resp * dens
    alpha = jnp.minimum(cfg.max_alpha, alpha_raw)
    hit_t = -q * inv_m
    return ((bx, by, bz), cx, cy, cz, q, inv_m, c2, sq, resp, dens,
            alpha_raw, alpha, hit_t)


def _fast_pullback(rec, ray_d, b3, cx, cy, cz, q, inv_m, c2, sq, resp,
                   dens, alpha_raw, g_alpha, g_ht_full, w, g_feat,
                   cfg: RasterKernelConfig):
    """Hand pullback of (g_alpha, g_hit_t, feature-sum) cotangents in
    UNSORTED lane order to the 16-row record fields (see _fast_operands
    for the forward factorization). ``b3`` is the (bx, by, bz) = M d
    component triple from _fast_fwd_vals."""
    f = cfg.feat_dim
    k = rec.shape[1]
    g_eff = jnp.where(alpha_raw < cfg.max_alpha, g_alpha, 0.0)  # min()
    d_resp = g_eff * dens
    d_dens_elt = g_eff * resp
    d_sq = d_resp * particle_response_dsq(sq, resp, cfg.kernel_degree)
    # hit_t = -q * inv_m ; sq = c2 * inv_m ; inv_m = 1/m
    d_q = -g_ht_full * inv_m
    d_inv_m = d_sq * c2 - g_ht_full * q
    d_c2 = d_sq * inv_m
    d_m = -d_inv_m * inv_m * inv_m
    d_cx = 2.0 * d_c2 * cx
    d_cy = 2.0 * d_c2 * cy
    d_cz = 2.0 * d_c2 * cz

    # reductions to the per-particle operands, all MXU contractions over
    # the pixel dim (no explicit transpose, which Mosaic dislikes for
    # narrow [256,3] tiles): d_N rows via ray_d^T @ d_c, d_M rows via
    # ray_d^T @ (2 b_i d_m) [m = sum b_i^2], d_u via ray_d^T @ d_q
    def rdot(dc):
        return dot_cot(ray_d, dc, (((0,), (0,)), ((), ())))

    bx, by, bz = b3
    if cfg.fused_mxu_bwd:
        # all seven pixel-dim contractions share LHS ray_d: one
        # [256,7K] RHS lane-concat, one matmul, lane slices back out
        kk = d_cx.shape[1]
        wide = jnp.concatenate(
            [d_cx, d_cy, d_cz, 2.0 * bx * d_m, 2.0 * by * d_m,
             2.0 * bz * d_m, d_q], axis=1)
        res = rdot(wide)                                         # [3,7K]
        d_n0, d_n1, d_n2 = (res[:, 0:kk], res[:, kk:2 * kk],
                            res[:, 2 * kk:3 * kk])
        d_b = [res[:, 3 * kk:4 * kk], res[:, 4 * kk:5 * kk],
               res[:, 5 * kk:6 * kk]]
        d_u = res[:, 6 * kk:7 * kk]
    else:
        d_n0, d_n1, d_n2 = rdot(d_cx), rdot(d_cy), rdot(d_cz)   # [3,K]
        d_b = [rdot(2.0 * bx * d_m), rdot(2.0 * by * d_m),
               rdot(2.0 * bz * d_m)]                            # 3x [3,K]
        d_u = rdot(d_q)                                         # [3,K]
    d_feats = dot_cot(g_feat, w, (((0,), (0,)), ((), ())))                      # [F,K]

    # per-particle chain back to the 16-row record fields ([1,K] ops):
    #   N = [a]x M, b = M d (m = |b|^2), u = M^T a
    ax, ay, az = _row(rec, _GRO), _row(rec, _GRO + 1), _row(rec, _GRO + 2)
    mr = [[_row(rec, _M + 3 * i + j) for j in range(3)]
          for i in range(3)]
    dn = [[d_n0[j:j + 1, :] for j in range(3)],
          [d_n1[j:j + 1, :] for j in range(3)],
          [d_n2[j:j + 1, :] for j in range(3)]]
    du = [d_u[j:j + 1, :] for j in range(3)]

    d_a = [jnp.zeros_like(ax) for _ in range(3)]
    d_mr = [[jnp.zeros_like(ax) for _ in range(3)] for _ in range(3)]
    # N row 0 = ay*M2 - az*M1 ; row 1 = az*M0 - ax*M2 ; row 2 = ax*M1
    # - ay*M0
    for j in range(3):
        d_a[1] += mr[2][j] * dn[0][j]
        d_a[2] += -mr[1][j] * dn[0][j]
        d_a[2] += mr[0][j] * dn[1][j]
        d_a[0] += -mr[2][j] * dn[1][j]
        d_a[0] += mr[1][j] * dn[2][j]
        d_a[1] += -mr[0][j] * dn[2][j]
        d_mr[2][j] += ay * dn[0][j]
        d_mr[1][j] += -az * dn[0][j]
        d_mr[0][j] += az * dn[1][j]
        d_mr[2][j] += -ax * dn[1][j]
        d_mr[1][j] += ax * dn[2][j]
        d_mr[0][j] += -ay * dn[2][j]
    # m = sum_i b_i^2 with b_i = sum_j M[i,j] d_j:
    # d_M[i,j] = sum_pix d_j * (2 b_i d_m) = rdot(2 b_i d_m)[j]
    for i in range(3):
        for j in range(3):
            d_mr[i][j] += d_b[i][j:j + 1, :]
    # u_j = sum_i a_i M[i,j]
    a_rows = (ax, ay, az)
    for i in range(3):
        for j in range(3):
            d_mr[i][j] += a_rows[i] * du[j]
            d_a[i] += mr[i][j] * du[j]

    rows = jax.lax.broadcasted_iota(jnp.int32, (cfg.record_dim, k), 0)
    d_rec = jnp.zeros((cfg.record_dim, k), jnp.float32)
    for i in range(3):
        d_rec = _rows16_put(d_rec, rows, _GRO + i, d_a[i])
    for i in range(3):
        for j in range(3):
            d_rec = _rows16_put(d_rec, rows, _M + 3 * i + j, d_mr[i][j])
    d_rec = _rows16_put(d_rec, rows, cfg.density_row,
                        jnp.sum(d_dens_elt, axis=0, keepdims=True))
    for c in range(f):
        d_rec = _rows16_put(d_rec, rows, cfg.feat_offset + c,
                            d_feats[c:c + 1, :])
    return d_rec


def _bwd_chunk_fast(rec, ray_d, tmin, tmax, t_in, phi_rem, t_final,
                    g_feat, g_t, g_depth, lane_mask,
                    cfg: RasterKernelConfig):
    """Fused forward-recompute + hand-derived backward for the
    shared-origin / constant-features / unsorted path (the training hot
    path). One pass computes the chunk_hits_fast intermediates and reuses
    them for the pullback, replacing jax.vjp's forward replay; the
    cotangent assembly uses the suffix-sum reformulation (see
    _suffix_cotangents).

    Returns (d_rec [R,K], t_out [256,1], psi_sum [256,1]).
    """
    f = cfg.feat_dim
    (b3, cx, cy, cz, q, inv_m, c2, sq, resp, dens, alpha_raw, alpha,
     hit_t) = _fast_fwd_vals(rec, ray_d, cfg)
    if cfg.kernel_degree == 0:
        accept = (resp > cfg.min_response) & (alpha > cfg.min_alpha)
    else:
        accept = sq < _sq_accept_threshold(dens, cfg)
    ok = accept & (hit_t > tmin) & (hit_t < tmax) & lane_mask
    alpha = jnp.where(ok, alpha, 0.0)

    def _live(alpha):
        prefix = _prefix_excl(1.0 - alpha, cfg)
        t_prev = t_in * prefix
        if cfg.exact_kill:
            alive = t_prev >= cfg.min_transmittance
            alpha_eff = jnp.where(alive, alpha, 0.0)
            w = alpha_eff * t_prev
            dead_vals = jnp.where(alive, -1.0, t_prev)
            t_frozen = jnp.max(dead_vals, axis=1, keepdims=True)
            t_raw_end = t_prev[:, -1:] * (1.0 - alpha[:, -1:])
            t_out = jnp.where(t_frozen >= 0.0, t_frozen, t_raw_end)
        else:
            alpha_eff = alpha
            w = alpha * t_prev
            t_out = t_prev[:, -1:] * (1.0 - alpha[:, -1:])

        # --- cotangents (single suffix sum; phi via one MXU dot) ---
        feats = rec[cfg.feat_offset:cfg.feat_offset + f, :]      # [F,K]
        phi = dot_cot(g_feat, feats, (((1,), (0,)), ((), ())))
        u = phi + g_depth * hit_t
        psi = w * u
        csum = _cumsum(psi, cfg)
        psi_sum = csum[:, -1:]
        suffix = phi_rem - csum
        active = w > 0.0
        inv_1ma = 1.0 / jnp.maximum(1.0 - alpha_eff, 1e-6)
        g_alpha = jnp.where(
            active, t_prev * u - (suffix + g_t * t_final) * inv_1ma, 0.0)
        g_ht_full = jnp.where(active, g_depth * w, 0.0)

        d_rec = _fast_pullback(rec, ray_d, b3, cx, cy, cz, q, inv_m, c2,
                               sq, resp, dens, alpha_raw, g_alpha,
                               g_ht_full, w, g_feat, cfg)
        return d_rec, t_out, psi_sum

    if not cfg.skip_dead_bwd:
        return _live(alpha)

    def _dead(alpha):
        return (jnp.zeros((cfg.record_dim, alpha.shape[1]), jnp.float32),
                t_in, jnp.zeros_like(t_in))
    return jax.lax.cond(jnp.max(alpha) > 0.0, _live, _dead, alpha)


def _bwd_chunk_fast_sorted(rec, ray_d, tmin, tmax, t_in, phi_rem, t_final,
                           g_feat, g_t, g_depth, lane_mask,
                           cfg: RasterKernelConfig):
    """Hand-derived backward for the sorted (3DGRT) shared-origin path.

    Replaces jax.vjp through the bitonic network: compositing cotangents
    are computed in the SORTED domain (where the transmittance recurrence
    lives), then permuted back to unsorted lane order with a second
    windowed sort keyed by the carried original lane indices (window-local
    sorts keep indices in-group, so sorting by index restores the original
    order exactly). The hit-math pullback then reuses the unsorted fast
    path. Features enter via the per-lane contraction phi = <g_feat, f>,
    which rides the sort as one extra payload instead of F of them.

    Returns (d_rec [R,K], t_out [256,1], psi_sum [256,1]).
    """
    f = cfg.feat_dim
    (b3, cx, cy, cz, q, inv_m, c2, sq, resp, dens, alpha_raw, alpha,
     hit_t) = _fast_fwd_vals(rec, ray_d, cfg)
    if cfg.kernel_degree == 0:
        accept = (resp > cfg.min_response) & (alpha > cfg.min_alpha)
    else:
        accept = sq < _sq_accept_threshold(dens, cfg)
    ok = accept & (hit_t > tmin) & (hit_t < tmax) & lane_mask
    alpha = jnp.where(ok, alpha, 0.0)

    def _live(alpha):
        feats = rec[cfg.feat_offset:cfg.feat_offset + f, :]      # [F,K]
        phi_u = dot_cot(g_feat, feats, (((1,), (0,)), ((), ())))
        # pre-contract the per-hit scalar u = <g_feat,f> + g_depth*hitT
        # so it rides the sort as ONE payload (phi and hit_t are only
        # ever used through u in the sorted domain)
        u_u = phi_u + g_depth * hit_t
        key = jnp.where(alpha > 0.0, hit_t, jnp.float32(3.0e38))
        _, (a_s, u_s), masks = bitonic_sort_by_key(
            key, [alpha, u_u], window=cfg.sort_window, return_masks=True)

        # composite + suffix cotangents in sorted order (mirrors the fwd)
        prefix = _prefix_excl(1.0 - a_s, cfg)
        t_prev = t_in * prefix
        if cfg.exact_kill:
            alive = t_prev >= cfg.min_transmittance
            alpha_eff = jnp.where(alive, a_s, 0.0)
            w_s = alpha_eff * t_prev
            dead_vals = jnp.where(alive, -1.0, t_prev)
            t_frozen = jnp.max(dead_vals, axis=1, keepdims=True)
            t_raw_end = t_prev[:, -1:] * (1.0 - a_s[:, -1:])
            t_out = jnp.where(t_frozen >= 0.0, t_frozen, t_raw_end)
        else:
            alpha_eff = a_s
            w_s = a_s * t_prev
            t_out = t_prev[:, -1:] * (1.0 - a_s[:, -1:])

        psi = w_s * u_s
        csum = _cumsum(psi, cfg)
        psi_sum = csum[:, -1:]
        suffix = phi_rem - csum
        active = w_s > 0.0
        inv_1ma = 1.0 / jnp.maximum(1.0 - alpha_eff, 1e-6)
        g_alpha_s = jnp.where(
            active, t_prev * u_s - (suffix + g_t * t_final) * inv_1ma, 0.0)

        # un-permute cotangents back to the original lane order via mask
        # replay (no index payload rides the sort, no key work here); the
        # hitT cotangent g_depth*w needs only the un-permuted w
        g_alpha, w = bitonic_replay_unsort(masks, [g_alpha_s, w_s])
        g_ht_full = jnp.where(w > 0.0, g_depth * w, 0.0)

        d_rec = _fast_pullback(rec, ray_d, b3, cx, cy, cz, q, inv_m, c2,
                               sq, resp, dens, alpha_raw, g_alpha,
                               g_ht_full, w, g_feat, cfg)
        return d_rec, t_out, psi_sum

    if not cfg.sort_skip_dead:
        return _live(alpha)

    # all-dead visits yield zero gradients and leave T unchanged: skip
    # the sort network, scans AND the hit-math pullback behind one
    # scalar branch (3DGRT segments are long and their tails die)
    def _dead(alpha):
        return (jnp.zeros((cfg.record_dim, alpha.shape[1]), jnp.float32),
                t_in, jnp.zeros_like(t_in))
    return jax.lax.cond(jnp.max(alpha) > 0.0, _live, _dead, alpha)


def _bwd_chunk_grads(rec, ray_o, ray_d, tmin, tmax, t_cur, phi_rem,
                     t_final, g_feat, g_t, g_depth, lane_mask,
                     cfg: RasterKernelConfig):
    """Per-chunk gradient computation shared by the backward kernels.

    Returns (d_rec [R,K], t_out [256,1], psi_sum [256,1]).
    """
    if cfg.shared_origin and cfg.feature_mode == "constant":
        fn = (_bwd_chunk_fast_sorted if cfg.sorted_compositing
              else _bwd_chunk_fast)
        return fn(rec, ray_d, tmin, tmax, t_cur, phi_rem, t_final,
                  g_feat, g_t, g_depth, lane_mask, cfg)

    f = cfg.feat_dim
    (w, alpha_eff, hit_t, t_prev, t_out, canonical,
     sorted_feats, _normals) = _chunk_composite(
        rec, ray_o, ray_d, tmin, tmax, t_cur, cfg, lane_mask)

    if sorted_feats is not None:
        hit_feats = sorted_feats
    elif cfg.feature_mode == "constant":
        hit_feats = [
            jnp.broadcast_to(_row(rec, cfg.feat_offset + c), w.shape)
            for c in range(f)]
    else:
        hit_feats = nht_hit_features(rec, canonical, cfg)

    g_alpha, g_hit_t, psi_sum = _suffix_cotangents(
        w, hit_t, t_prev, alpha_eff, hit_feats, phi_rem, t_final, g_feat,
        g_t, g_depth, cfg)

    # --- pull back into record space via autodiff ---
    w_const = jax.lax.stop_gradient(w)

    def chunk_fn(r):
        a, ht, canon, _ = chunk_hits_dispatch(r, ray_o, ray_d, cfg)
        in_range = (ht > tmin) & (ht < tmax) & lane_mask
        a = jnp.where(in_range, a, 0.0)
        if cfg.sorted_compositing:
            fts = [jnp.broadcast_to(_row(r, cfg.feat_offset + c),
                                    a.shape) for c in range(f)]
            key = jnp.where(a > 0.0, ht, jnp.float32(3.0e38))
            key = jax.lax.stop_gradient(key)
            _, sp = bitonic_sort_by_key(key, [a, ht] + fts,
                                        window=cfg.sort_window)
            a, ht = sp[0], sp[1]
            fsum = jnp.concatenate(
                [jnp.sum(w_const * ff, axis=1, keepdims=True)
                 for ff in sp[2:]], axis=1)
        elif cfg.feature_mode == "constant":
            feats_kf = jnp.transpose(
                r[cfg.feat_offset:cfg.feat_offset + f, :])
            # primal fsum is discarded by the jax.vjp caller below —
            # only the transpose (a cotangent dot) survives
            fsum = dot_cot(w_const, feats_kf,
                           (((1,), (0,)), ((), ())))
        else:
            fsum = nht_feature_weighted_sum(r, canon, w_const, None, cfg)
        return a, ht, fsum

    _, vjp_fn = jax.vjp(chunk_fn, rec)
    (d_rec,) = vjp_fn((g_alpha, g_hit_t, g_feat))
    return d_rec, t_out, psi_sum


# ---------------------------------------------------------------------------
# backward kernel (strip-of-tiles per program)
# ---------------------------------------------------------------------------
#
# Gradient accumulation across tiles sharing a boundary chunk happens in
# VMEM: each parity slot of grad_buf holds the d_rec of the most recent
# chunk as a *pending* write (pend_ref), and a revisit of the same chunk
# by the next tile adds into it instead of the old HBM read-modify-write.
# A pending chunk is flushed (async write) as soon as a DIFFERENT chunk
# claims its slot — started before the visit's math so the write hides
# under compute — and the only HBM read-back left is the first visited
# chunk of the whole kernel... of each *strip chain start*, handled via
# rmw_ref (strips continue each other: state persists across programs,
# so in practice only the very first visit of the grid ever reads back;
# the flag exists to keep the scheme correct under that single case).


def _bwd_strip_kernel(tile_start_ref, tile_count_ref, records_hbm, rays_ref,
                      fwd_out_ref, grad_out_ref, grads_hbm,
                      chunk_buf, grad_buf, rmw_buf, sem, out_sem, rmw_sem,
                      res_ref, inf_ref, pend_ref, wfl_ref, *,
                      cfg: RasterKernelConfig, strip: int, tp: int):
    prog = pl.program_id(0)

    @pl.when(prog == 0)
    def _():
        for slot in range(2):
            res_ref[slot] = -1
            inf_ref[slot] = -1
            pend_ref[slot] = -1
            wfl_ref[slot] = -1

    if cfg.shared_segments:
        prefetch, wait_ready, drain = _mk_chunk_fetch(
            records_hbm, chunk_buf, sem, res_ref, inf_ref)
    else:
        prefetch, wait_ready, drain = _mk_chunk_fetch_mono(
            records_hbm, chunk_buf, sem, res_ref)
    slot_mod = 2 if cfg.shared_segments else RING
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    f = cfg.feat_dim

    def out_dma(slot, g):
        return pltpu.make_async_copy(grad_buf.at[slot], grads_hbm.at[g],
                                     out_sem.at[slot])

    def claim_slot(g):
        """Flush a pending different-chunk write out of g's parity slot.
        Returns accum_same (pending already holds chunk g)."""
        slot = jax.lax.rem(g, 2)
        pending = pend_ref[slot]
        accum_same = pending == g

        @pl.when((pending >= 0) & ~accum_same)
        def _():
            # retire the previous write on this slot before reusing the
            # semaphore (it finished long ago)
            @pl.when(wfl_ref[slot] >= 0)
            def _():
                out_dma(slot, wfl_ref[slot]).wait()

            out_dma(slot, pending).start()
            wfl_ref[slot] = pending
            pend_ref[slot] = -1

        return accum_same

    def commit_slot(g, accum_same, d_rec):
        """Store/accumulate d_rec as chunk g's pending value."""
        slot = jax.lax.rem(g, 2)

        @pl.when(accum_same)
        def _():
            grad_buf[slot] = grad_buf[slot] + d_rec

        @pl.when(~accum_same)
        def _():
            # the flush started in claim_slot reads grad_buf[slot]; it
            # ran during the visit's math — wait before overwriting
            @pl.when(wfl_ref[slot] >= 0)
            def _():
                out_dma(slot, wfl_ref[slot]).wait()
                wfl_ref[slot] = -1

            grad_buf[slot] = d_rec
            pend_ref[slot] = g

    if cfg.shared_segments:
        # trace() API: every tile scans the SAME segment, so chunk g's
        # total gradient is the sum over ALL tiles. The in-VMEM pending
        # accumulation only merges *consecutive* same-chunk visits, so
        # here every non-merged visit re-reads HBM (tiles after the
        # first) — the strip driver then must run with strip == 1 per
        # visit ordering identical to the per-tile kernel. Enforced by
        # the host wrapper choosing strip=1 for shared_segments.
        assert strip == 1, "shared_segments requires strip=1"

    def tile_body(s, _):
        t = prog * strip + s
        start = tile_start_ref[t]
        end = start + tile_count_ref[t]
        first = start // CHUNK
        nchunks = jnp.where(end > start,
                            (end + CHUNK - 1) // CHUNK - first, 0)

        ray_o = rays_ref[s, :, 0:3]
        ray_d = rays_ref[s, :, 3:6]
        tmin = rays_ref[s, :, 6:7]
        tmax = rays_ref[s, :, 7:8]

        feat_total = fwd_out_ref[s, :, 0:f]                # [256,F]
        depth_total = fwd_out_ref[s, :, f + 1:f + 2]
        t_final = fwd_out_ref[s, :, f + 3:f + 4]

        g_feat = grad_out_ref[s, :, 0:f]
        # lane f is (1 - T_final), lane f+3 is T_final itself
        g_t = (grad_out_ref[s, :, f + 3:f + 4]
               - grad_out_ref[s, :, f:f + 1])
        g_depth = grad_out_ref[s, :, f + 1:f + 2]

        # per-pixel total of psi = w*(<g_feat,f> + g_depth*hitT) over all
        # chunks == <g_feat, feat_total> + g_depth * depth_total
        phi_total = (jnp.sum(g_feat * feat_total, axis=1, keepdims=True)
                     + g_depth * depth_total)

        last = first + nchunks - 1

        @pl.when(nchunks > 0)
        def _():
            prefetch(first, last)

        def cond(state):
            i, t_cur, _ = state
            # early exit once every ray is dead: remaining chunks
            # contribute exactly zero gradient (w == 0 under the kill
            # mask) and zero-visit below keeps the pending scheme exact
            if not cfg.early_exit:
                return i < nchunks
            return (i < nchunks) & (jnp.max(t_cur) >= cfg.min_transmittance)

        def shared_accum(g, accum_same, d_rec):
            """shared_segments only: accumulate with the HBM value
            written by previous tiles (t > 0) when the pending buffer
            does not already hold this chunk."""
            if not cfg.shared_segments:
                return d_rec
            need_rmw = (t > 0) & ~accum_same
            rmw = pltpu.make_async_copy(grads_hbm.at[g], rmw_buf, rmw_sem)

            @pl.when(need_rmw)
            def _():
                rmw.start()
                rmw.wait()

            return jnp.where(need_rmw, d_rec + rmw_buf[:, :], d_rec)

        def body(state):
            i, t_cur, phi_acc = state
            g = first + i

            wait_ready(g)

            @pl.when(i + 1 < nchunks)
            def _():
                prefetch(g + 1, last)

            accum_same = claim_slot(g)

            rec = chunk_buf[jax.lax.rem(g, slot_mod)]
            if cfg.records_bf16:
                rec = rec.astype(jnp.float32)
            g0 = g * CHUNK
            lane_mask = (lane + g0 >= start) & (lane + g0 < end)
            d_rec, t_out, psi_sum = _bwd_chunk_grads(
                rec, ray_o, ray_d, tmin, tmax, t_cur, phi_total - phi_acc,
                t_final, g_feat, g_t, g_depth, lane_mask, cfg)
            d_rec = shared_accum(g, accum_same, d_rec)
            commit_slot(g, accum_same, d_rec)
            return i + 1, t_out, phi_acc + psi_sum

        init = (jnp.asarray(0, jnp.int32),
                jnp.ones((TILE_PIX, 1), jnp.float32),
                jnp.zeros((TILE_PIX, 1), jnp.float32))
        i_end, _, _ = jax.lax.while_loop(cond, body, init)

        # zero-visit the skipped (all-dead) chunks so every chunk of the
        # tile's range flows through the pending scheme (a later tile
        # revisiting a zero-filled boundary chunk then accumulates
        # correctly). In shared_segments mode later tiles contribute
        # exactly zero to their skipped chunks, whose HBM values must be
        # preserved — only tile 0 zero-initializes there.
        def zbody(i, _):
            g = first + i
            accum_same = claim_slot(g)
            zero = jnp.zeros((cfg.record_dim, CHUNK), jnp.float32)
            # accum_same: pending already holds g; adding 0 is a no-op
            commit_slot(g, accum_same, zero)
            return 0

        if cfg.shared_segments:
            zstart = jnp.where(t == 0, i_end, nchunks)
        else:
            zstart = i_end
        jax.lax.fori_loop(zstart, nchunks, zbody, 0)

        _prefetch_next_tile(t, tp, tile_start_ref, tile_count_ref,
                            prefetch)
        return 0

    jax.lax.fori_loop(0, strip, tile_body, 0)

    # final program: flush pendings and retire every DMA
    @pl.when(prog == pl.num_programs(0) - 1)
    def _():
        drain()
        for slot in range(2):
            @pl.when(wfl_ref[slot] >= 0)
            def _():
                out_dma(slot, wfl_ref[slot]).wait()
                wfl_ref[slot] = -1

            pending = pend_ref[slot]

            @pl.when(pending >= 0)
            def _():
                w_dma = out_dma(slot, pending)
                w_dma.start()
                w_dma.wait()
                pend_ref[slot] = -1


# ---------------------------------------------------------------------------
# weight telemetry kernel (GS strategy prune_weight)
# ---------------------------------------------------------------------------

def _wmax_kernel(tile_start_ref, tile_count_ref, records_hbm, rays_ref,
                 wmax_hbm, chunk_buf, row_buf, rmw_buf, sem, out_sem,
                 rmw_sem, *, cfg: RasterKernelConfig):
    """Per-pair max blend weight max_pixel(alpha * T) - the telemetry the
    reference GS strategy's weight pruning consumes (strategy/gs.py
    prune via max contribution). Forward-only; same chunk streaming and
    shared-boundary read-modify-write (max) as the backward kernel."""
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = start + tile_count_ref[t]
    first = start // CHUNK
    nchunks = jnp.where(end > start,
                        (end + CHUNK - 1) // CHUNK - first, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    shared_first = jax.lax.rem(start, CHUNK) != 0

    ray_o = rays_ref[0, :, 0:3]
    ray_d = rays_ref[0, :, 3:6]
    tmin = rays_ref[0, :, 6:7]
    tmax = rays_ref[0, :, 7:8]

    def get_dma(slot, i):
        return pltpu.make_async_copy(records_hbm.at[first + i],
                                     chunk_buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        i, t_cur = state
        return (i < nchunks) & (jnp.max(t_cur) >= cfg.min_transmittance)

    def body(state):
        i, t_cur = state
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            get_dma(1 - slot, i + 1).start()

        get_dma(slot, i).wait()

        @pl.when(shared_first & (i == 0))
        def _():
            pltpu.make_async_copy(wmax_hbm.at[first], rmw_buf,
                                  rmw_sem).start()

        rec = chunk_buf[slot]
        g0 = (first + i) * CHUNK
        lane_mask = (lane + g0 >= start) & (lane + g0 < end)
        w, _, _, _, t_out, _, _, _ = _chunk_composite(
            rec, ray_o, ray_d, tmin, tmax, t_cur, cfg, lane_mask,
            unsort_w=cfg.feature_mode == "constant")
        wrow = jnp.max(w, axis=0, keepdims=True)        # [1, CHUNK]
        wrow = jnp.broadcast_to(wrow, (8, CHUNK))

        @pl.when(shared_first & (i == 0))
        def _():
            pltpu.make_async_copy(wmax_hbm.at[first], rmw_buf,
                                  rmw_sem).wait()

        row_buf[:, :] = jnp.where(shared_first & (i == 0),
                                  jnp.maximum(wrow, rmw_buf[:, :]), wrow)
        out_dma = pltpu.make_async_copy(row_buf, wmax_hbm.at[first + i],
                                        out_sem)
        out_dma.start()
        out_dma.wait()
        return i + 1, t_out

    init = (jnp.asarray(0, jnp.int32), jnp.ones((TILE_PIX, 1), jnp.float32))
    i_end, _ = jax.lax.while_loop(cond, body, init)

    @pl.when((i_end > 0) & (i_end < nchunks))
    def _():
        get_dma(jax.lax.rem(i_end, 2), i_end).wait()

    @pl.when(i_end < nchunks)
    def _():
        row_buf[:, :] = jnp.zeros_like(row_buf)

        def zbody(i, _):
            dma = pltpu.make_async_copy(row_buf, wmax_hbm.at[first + i],
                                        out_sem)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(i_end, nchunks, zbody, 0)


def rasterize_weight_telemetry(records, tile_start, tile_count, rays,
                               cfg: RasterKernelConfig,
                               interpret: bool = False):
    """Per-pair max_pixel(alpha * T) over all tiles -> [C * CHUNK]."""
    num_tiles = rays.shape[0]
    n_chunks = records.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TILE_PIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, cfg.record_dim, CHUNK), jnp.float32),
            pltpu.VMEM((8, CHUNK), jnp.float32),
            pltpu.VMEM((8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    wmax = pl.pallas_call(
        functools.partial(_wmax_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 8, CHUNK), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, records, rays)
    # rows past the last tile's segment are never written
    last_pair = tile_start[-1] + tile_count[-1]
    last = (last_pair + CHUNK - 1) // CHUNK
    used = jnp.arange(n_chunks, dtype=jnp.int32)[:, None] < last
    return jnp.where(used, wmax[:, 0, :], 0.0).reshape(-1)


# ---------------------------------------------------------------------------
# host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

# tiles per grid step (fwd/bwd strip kernels). Consecutive tiles share
# boundary chunks and their block I/O amortizes over the strip; one grid
# step per tile (the round-1 design) paid ~1.4 us/program x 2500 tiles
# per pass (tpu_profile9).
STRIP = 25


def _strip_for(cfg: RasterKernelConfig) -> int:
    # shared_segments (trace()): every tile walks the same chunk range
    # and tiles>0 must read back HBM gradients; the pending-accumulate
    # scheme requires the per-tile visit order of strip=1
    return 1 if cfg.shared_segments else STRIP


def _pad_tiles(tile_start, tile_count, rays, tpb):
    t = rays.shape[0]
    pad = (-t) % tpb
    if pad:
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros(pad, tile_start.dtype)])
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros(pad, tile_count.dtype)])
        rays = jnp.pad(rays, ((0, pad), (0, 0), (0, 0)))
    return tile_start, tile_count, rays, t + pad


def _pallas_forward(records, tile_start, tile_count, rays, cfg, interpret):
    if cfg.flat_grid and not cfg.shared_segments:
        return _flat_forward(records, tile_start, tile_count, rays, cfg,
                             interpret)
    num_tiles = rays.shape[0]
    strip = _strip_for(cfg)
    if cfg.records_bf16:
        records = records.astype(jnp.bfloat16)
    tile_start, tile_count, rays, tp = _pad_tiles(tile_start, tile_count,
                                                  rays, strip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tp // strip,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((strip, TILE_PIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((strip, TILE_PIX, cfg.out_dim),
                               lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RING, cfg.record_dim, CHUNK), records.dtype),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_strip_kernel, cfg=cfg, strip=strip, tp=tp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, TILE_PIX, cfg.out_dim),
                                       jnp.float32),
        interpret=interpret,
        # the sorted forward's bitonic network + mask-replay unsort
        # needs ~20 MB of scoped stack at W=64/CHUNK=256, and the NHT
        # forward (record_dim 64, out_dim 32, in-kernel tetra interp)
        # overflows the 16 MB default by ~0.4 MB at protocol scale -
        # both are well within the chip's 128 MB VMEM (the backward
        # kernel below has the same carve-out)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 << 20)) if (
                cfg.sorted_compositing or cfg.feature_mode != "constant")
        else None,
    )(tile_start, tile_count, records, rays)
    return out[:num_tiles]


def _pallas_backward(records, tile_start, tile_count, rays, fwd_out,
                     grad_out, cfg, interpret):
    if cfg.flat_grid and not cfg.shared_segments:
        return _flat_backward(records, tile_start, tile_count, rays,
                              fwd_out, grad_out, cfg, interpret)
    n_chunks = records.shape[0]
    num_tiles = rays.shape[0]
    strip = _strip_for(cfg)
    if cfg.records_bf16:
        records = records.astype(jnp.bfloat16)
    tile_start, tile_count, rays, tp = _pad_tiles(tile_start, tile_count,
                                                  rays, strip)
    pad = tp - num_tiles
    if pad:
        fwd_out = jnp.pad(fwd_out, ((0, pad), (0, 0), (0, 0)))
        grad_out = jnp.pad(grad_out, ((0, pad), (0, 0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tp // strip,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((strip, TILE_PIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((strip, TILE_PIX, cfg.out_dim),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((strip, TILE_PIX, cfg.out_dim),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((RING, cfg.record_dim, CHUNK), records.dtype),
            pltpu.VMEM((2, cfg.record_dim, CHUNK), jnp.float32),
            pltpu.VMEM((cfg.record_dim, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_strip_kernel, cfg=cfg, strip=strip, tp=tp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, cfg.record_dim, CHUNK),
                                       jnp.float32),
        interpret=interpret,
        # the general sorted backward (trace(): general geometry or NHT)
        # vjps through the bitonic network and needs ~29 MB of stack at
        # CHUNK=256 - above the default 16 MB scoped-vmem limit but well
        # within the chip's 128 MB VMEM. The shared-origin sorted path
        # uses the hand-derived _bwd_chunk_fast_sorted instead.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(64 << 20) if (
                (cfg.sorted_compositing
                 and not (cfg.shared_origin
                          and cfg.feature_mode == "constant"))
                # NHT backward (record_dim 64, out_dim 32, signed-
                # feature pullback) overflows 32 MB by ~0.4 MB at
                # protocol scale — same carve-out class as the vjp'd
                # sorted path
                or cfg.feature_mode != "constant")
            # strip blocks (3x [S,256,8] double-buffered) + loop temps
            # overflow the 16 MB default scoped-vmem limit slightly
            else (32 << 20)),
    )(tile_start, tile_count, records, rays, fwd_out, grad_out)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rasterize_tiles(records: jnp.ndarray, tile_start: jnp.ndarray,
                    tile_count: jnp.ndarray, rays: jnp.ndarray,
                    cfg: RasterKernelConfig, interpret: bool = False):
    """Composite chunk-aligned pair records over ray tiles.

    Args:
        records: [C, cfg.record_dim, CHUNK] chunked pair records.
        tile_start: [T] int32 CHUNK-aligned segment starts (pair units).
        tile_count: [T] int32 CHUNK-aligned segment lengths. Segments must
            be disjoint for the backward pass unless cfg.shared_segments
            is set (the trace() API: one segment shared by all tiles,
            backward accumulates across programs).
        rays: [T, 256, 8].
        cfg: static RasterKernelConfig.
    Returns:
        [T, 256, cfg.out_dim] composited outputs.
    """
    return _pallas_forward(records, tile_start, tile_count, rays, cfg,
                           interpret)


def _rasterize_fwd(records, tile_start, tile_count, rays, cfg, interpret):
    out = _pallas_forward(records, tile_start, tile_count, rays, cfg,
                          interpret)
    return out, (records, tile_start, tile_count, rays, out)


def _rasterize_bwd(cfg, interpret, saved, grad_out):
    records, tile_start, tile_count, rays, fwd_out = saved
    d_records = _pallas_backward(records, tile_start, tile_count, rays,
                                 fwd_out, grad_out, cfg, interpret)
    # the kernel writes only segment chunks; the tail past the last
    # segment is uninitialized
    n_chunks = records.shape[0]
    last_pair = tile_start[-1] + tile_count[-1]
    last = (last_pair + CHUNK - 1) // CHUNK
    used = jnp.arange(n_chunks, dtype=jnp.int32)[:, None, None] < last
    d_records = jnp.where(used, d_records, 0.0)
    return d_records, None, None, None


rasterize_tiles.defvjp(_rasterize_fwd, _rasterize_bwd)

# ---------------------------------------------------------------------------
# table-gradient variant: classic backward + on-chip row accumulation
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def rasterize_tiles_table(table: jnp.ndarray, records_sg: jnp.ndarray,
                          ids: jnp.ndarray, tile_start: jnp.ndarray,
                          tile_count: jnp.ndarray, rays: jnp.ndarray,
                          cfg: RasterKernelConfig, interpret: bool = False):
    """rasterize_tiles variant whose gradient flows to the per-particle
    TABLE: the backward runs the standard kernel to per-pair d_records and
    folds them into d_table with a sequential Pallas row-accumulator
    (ops/pallas/scatter.py) instead of an XLA scatter-add.

    Args:
        table: [table_rows, record_dim] per-particle records (the
            differentiable input; must fit in VMEM).
        records_sg: stop-gradient pair records gathered from ``table``.
        ids: [C, CHUNK] int32 per-pair particle row.
    """
    return _pallas_forward(records_sg, tile_start, tile_count, rays, cfg,
                           interpret)


def _rasterize_table_fwd(table, records_sg, ids, tile_start, tile_count,
                         rays, cfg, interpret):
    out = _pallas_forward(records_sg, tile_start, tile_count, rays, cfg,
                          interpret)
    return out, (table.shape[0], records_sg, ids, tile_start, tile_count,
                 rays, out)


def _rasterize_table_bwd(cfg, interpret, saved, grad_out):
    from .scatter import scatter_accumulate_rows

    (table_rows, records_sg, ids, tile_start, tile_count, rays,
     fwd_out) = saved
    d_records = _pallas_backward(records_sg, tile_start, tile_count, rays,
                                 fwd_out, grad_out, cfg, interpret)
    # zero the chunks past the last segment (uninitialized) before
    # accumulation
    n_chunks = d_records.shape[0]
    last_pair = tile_start[-1] + tile_count[-1]
    last = (last_pair + CHUNK - 1) // CHUNK
    used = jnp.arange(n_chunks, dtype=jnp.int32)[:, None, None] < last
    d_records = jnp.where(used, d_records, 0.0)
    d_table = scatter_accumulate_rows(d_records, ids, table_rows,
                                      interpret=interpret)
    return d_table, None, None, None, None, None


rasterize_tiles_table.defvjp(_rasterize_table_fwd, _rasterize_table_bwd)

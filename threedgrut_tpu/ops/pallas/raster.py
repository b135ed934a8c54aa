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
  accumulation   : weighted feature/depth reductions over the lane axis.

The backward kernel replays the walk front-to-back using the residual
formulation of the reference (gaussianParticles.cuh:484-751: gradients
from integrated totals, no per-hit state), and pulls cotangents back to
the record fields with ``jax.vjp`` of the same chunk function the forward
uses - JAX autodiff inside the kernel replaces both the hand-derived CUDA
gradients and the Slang autodiff pipeline.

Data layout (built by threedgrut_tpu/render/gut.py):
  records [C, 16, CHUNK] f32: C = P_total/CHUNK chunk blocks; row = field:
          0:3 pos | 3:7 quat (normalized wxyz) | 7:10 scale | 10 density |
          11:14 features (rgb) | 14:16 pad. One chunk = one contiguous
          8 KiB DMA.
  rays    [T, 256, 8] f32: lanes 0-2 origin, 3-5 dir, 6 tmin, 7 tmax.
  out     [T, 256, 8] f32: lanes 0-2 feat, 3 alpha, 4 depth, 5 hits,
          6 final transmittance, 7 pad.
Tile pair segments are CHUNK-aligned (padding slots hold density=0
records) so chunk DMAs never straddle tiles and the backward writes whole
[16, CHUNK] gradient blocks race-free.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hit import particle_response

RECORD_DIM = 16
TILE_PIX = 256  # 16 x 16
CHUNK = 128     # candidates per chunk == lane width

# record field rows (general layout)
_POS = 0
_QUAT = 3
_SCALE = 7
_DENSITY = 10
_FEAT = 11

# record field rows (shared-origin fast layout; see chunk_hits_fast)
_U = 0        # 0:3   u = M^T M (o - p),  M = diag(1/s) R^T
_A6 = 3       # 3:9   A = M^T M packed [a00, a11, a22, a01, a02, a12]
_G2 = 9       # 9     |M (o - p)|^2
# density 10, features 11:14 as in the general layout


def _row(rec, i):
    """Record field row i as [1, K]."""
    return rec[i:i + 1, :]


def chunk_hits(rec, ray_o, ray_d, *, kernel_degree: int, min_response: float,
               min_alpha: float, max_alpha: float):
    """Alpha + hitT of K records against 256 rays -> ([256,K], [256,K]).

    rec: [16,K] field-major chunk; ray_o/ray_d: [256,3] (pixel-major).
    Differentiable w.r.t. rec. Same math as ops.hit.density_hit, laid out
    pixels-on-sublanes x candidates-on-lanes for the VPU.
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
    sx, sy, sz = _row(rec, _SCALE), _row(rec, _SCALE + 1), _row(rec, _SCALE + 2)
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

    response = particle_response(sq_dist, kernel_degree)
    density = _row(rec, _DENSITY)
    alpha = jnp.minimum(max_alpha, response * density)
    accept = (response > min_response) & (alpha > min_alpha)
    alpha = jnp.where(accept, alpha, 0.0)

    proj = -(gdx * gox + gdy * goy + gdz * goz)
    hx, hy, hz = sx * gdx * proj, sy * gdy * proj, sz * gdz * proj
    hit_t = jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-18))
    hit_t = jnp.where(proj < 0.0, -hit_t, hit_t)
    return alpha, hit_t


def chunk_hits_fast(rec, ray_d, *, kernel_degree: int, min_response: float,
                    min_alpha: float, max_alpha: float):
    """Shared-ray-origin fast path: alpha/hitT via two MXU matmuls.

    When every ray in the tile shares one origin o (pinhole/fisheye camera,
    global shutter - the training hot path), the per-(pair, pixel) response
    factorizes: with M = diag(1/s) R^T, u = M^T M (o-p), A = M^T M,
    g2 = |M (o-p)|^2 and unit direction d:

        q  = u . d                (MXU: [256,3] @ [3,K])
        m  = d^T A d              (MXU: [256,6] @ [6,K])
        sq_dist = g2 - q^2 / m    (canonical perpendicular distance^2)
        hitT    = -q / m          (signed max-response distance)

    ~10 VPU ops per element instead of the ~80 of the general transform.
    Algebraically identical to chunk_hits (same reference semantics).
    """
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]   # [256,1]
    d3 = ray_d                                                  # [256,3]
    d6 = jnp.concatenate([dx * dx, dy * dy, dz * dz,
                          2.0 * dx * dy, 2.0 * dx * dz, 2.0 * dy * dz],
                         axis=1)                                # [256,6]
    q = jax.lax.dot_general(d3, rec[_U:_U + 3, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [256,K]
    m = jax.lax.dot_general(d6, rec[_A6:_A6 + 6, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [256,K]
    inv_m = 1.0 / m
    sq_dist = jnp.maximum(_row(rec, _G2) - q * q * inv_m, 0.0)
    response = particle_response(sq_dist, kernel_degree)
    density = _row(rec, _DENSITY)
    alpha = jnp.minimum(max_alpha, response * density)
    accept = (response > min_response) & (alpha > min_alpha)
    alpha = jnp.where(accept, alpha, 0.0)
    hit_t = -q * inv_m
    return alpha, hit_t


def _prefix_product_excl(x):
    """Exclusive prefix product along the lane axis (axis 1), static K."""
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


def _cumsum_incl(x):
    """Inclusive prefix sum along the lane axis (axis 1), static K."""
    k = x.shape[1]
    y = x
    s = 1
    while s < k:
        shifted = jnp.concatenate([jnp.zeros_like(y[:, :s]), y[:, :-s]],
                                  axis=1)
        y = y + shifted
        s *= 2
    return y


def _chunk_composite(rec, ray_o, ray_d, tmin, tmax, t_in, cfg_static):
    """One chunk of front-to-back compositing (pixel-major layout).

    Returns (w [256,K] hit weights, alpha_eff, hit_t [256,K],
    t_prev [256,K], t_out [256,1]).
    """
    (kernel_degree, min_response, min_alpha, max_alpha,
     min_transmittance, shared_origin) = cfg_static
    if shared_origin:
        alpha, hit_t = chunk_hits_fast(
            rec, ray_d, kernel_degree=kernel_degree,
            min_response=min_response, min_alpha=min_alpha,
            max_alpha=max_alpha)
    else:
        alpha, hit_t = chunk_hits(
            rec, ray_o, ray_d, kernel_degree=kernel_degree,
            min_response=min_response, min_alpha=min_alpha,
            max_alpha=max_alpha)
    in_range = (hit_t > tmin) & (hit_t < tmax)
    alpha = jnp.where(in_range, alpha, 0.0)

    prefix = _prefix_product_excl(1.0 - alpha)        # [256,K]
    t_prev_raw = t_in * prefix
    alive = t_prev_raw >= min_transmittance           # kill semantics
    alpha_eff = jnp.where(alive, alpha, 0.0)
    prefix_eff = _prefix_product_excl(1.0 - alpha_eff)
    t_prev = t_in * prefix_eff                        # frozen after kill
    w = alpha_eff * t_prev
    t_out = t_prev[:, -1:] * (1.0 - alpha_eff[:, -1:])
    return w, alpha_eff, hit_t, t_prev, t_out


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(tile_start_ref, records_hbm, rays_ref, out_ref,
                chunk_buf, sem, *, cfg_static):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    nchunks = (tile_start_ref[t + 1] - start) // CHUNK
    first = start // CHUNK
    min_transmittance = cfg_static[4]

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
        i, t_cur, _, _, _ = state
        return (i < nchunks) & (jnp.max(t_cur) >= min_transmittance)

    def body(state):
        i, t_cur, feat, depth, hits = state
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            get_dma(1 - slot, i + 1).start()

        get_dma(slot, i).wait()
        rec = chunk_buf[slot]
        w, _, hit_t, _, t_out = _chunk_composite(
            rec, ray_o, ray_d, tmin, tmax, t_cur, cfg_static)
        # features: [256,K] x [K,3] on the MXU
        feats = jnp.transpose(rec[_FEAT:_FEAT + 3, :])            # [K,3]
        feat = feat + jax.lax.dot_general(
            w, feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [256,3]
        depth = depth + jnp.sum(w * hit_t, axis=1, keepdims=True)
        hits = hits + jnp.sum((w > 0.0).astype(jnp.float32), axis=1,
                              keepdims=True)
        return i + 1, t_out, feat, depth, hits

    init = (jnp.asarray(0, jnp.int32),
            jnp.ones((TILE_PIX, 1), jnp.float32),
            jnp.zeros((TILE_PIX, 3), jnp.float32),
            jnp.zeros((TILE_PIX, 1), jnp.float32),
            jnp.zeros((TILE_PIX, 1), jnp.float32))
    i_end, t_fin, feat, depth, hits = jax.lax.while_loop(cond, body, init)

    # Early exit leaves the chunk-(i_end) DMA (prefetched by iteration
    # i_end-1) in flight; drain it to keep semaphores balanced.
    @pl.when((i_end > 0) & (i_end < nchunks))
    def _():
        get_dma(jax.lax.rem(i_end, 2), i_end).wait()

    out_ref[0, :, 0:3] = feat
    out_ref[0, :, 3:4] = 1.0 - t_fin
    out_ref[0, :, 4:5] = depth
    out_ref[0, :, 5:6] = hits
    out_ref[0, :, 6:7] = t_fin
    out_ref[0, :, 7:8] = jnp.zeros((TILE_PIX, 1), jnp.float32)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(tile_start_ref, records_hbm, rays_ref, fwd_out_ref,
                grad_out_ref, grads_hbm,
                chunk_buf, grad_buf, sem, out_sem, *, cfg_static):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    nchunks = (tile_start_ref[t + 1] - start) // CHUNK
    first = start // CHUNK
    min_transmittance = cfg_static[4]

    ray_o = rays_ref[0, :, 0:3]
    ray_d = rays_ref[0, :, 3:6]
    tmin = rays_ref[0, :, 6:7]
    tmax = rays_ref[0, :, 7:8]

    feat_total = fwd_out_ref[0, :, 0:3]                # [256,3]
    depth_total = fwd_out_ref[0, :, 4:5]
    t_final = fwd_out_ref[0, :, 6:7]

    g_feat = grad_out_ref[0, :, 0:3]
    # lane 3 is (1 - T_final), lane 6 is T_final itself
    g_t = grad_out_ref[0, :, 6:7] - grad_out_ref[0, :, 3:4]
    g_depth = grad_out_ref[0, :, 4:5]

    def get_dma(slot, i):
        return pltpu.make_async_copy(records_hbm.at[first + i],
                                     chunk_buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        return state[0] < nchunks

    def body(state):
        i, t_cur, feat_acc, depth_acc = state
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            get_dma(1 - slot, i + 1).start()

        get_dma(slot, i).wait()
        rec = chunk_buf[slot]

        # --- replay forward chunk ---
        w, alpha_eff, hit_t, t_prev, t_out = _chunk_composite(
            rec, ray_o, ray_d, tmin, tmax, t_cur, cfg_static)
        feats = jnp.transpose(rec[_FEAT:_FEAT + 3, :])            # [K,3]
        t_after = t_prev * (1.0 - alpha_eff)
        next_alive = t_after > min_transmittance
        safe_t_after = jnp.where(next_alive, t_after, 1.0)

        # residual formulation (gaussianParticles.cuh:543-612)
        active = alpha_eff > 0.0
        g_alpha = jnp.zeros_like(w)
        for c in range(3):
            f_c = rec[_FEAT + c:_FEAT + c + 1, :]                 # [1,K]
            wf_c = w * f_c
            feat_upto_c = feat_acc[:, c:c + 1] + _cumsum_incl(wf_c)
            res_c = jnp.where(next_alive,
                              (feat_total[:, c:c + 1] - feat_upto_c)
                              / safe_t_after, 0.0)
            res_c = jnp.maximum(res_c, 0.0)
            g_alpha = g_alpha + g_feat[:, c:c + 1] * t_prev * (f_c - res_c)
        depth_upto = depth_acc + _cumsum_incl(w * hit_t)
        res_d = jnp.where(next_alive,
                          (depth_total - depth_upto) / safe_t_after, 0.0)
        res_d = jnp.maximum(res_d, 0.0)
        g_alpha = g_alpha + g_depth * t_prev * (hit_t - res_d)
        residual_trm = jnp.where(alpha_eff < 0.999999,
                                 t_final / (1.0 - alpha_eff), t_prev)
        # dT_final/dalpha_j = -T_final / (1 - alpha_j)
        g_alpha = g_alpha - g_t * residual_trm
        g_alpha = jnp.where(active, g_alpha, 0.0)
        g_hit_t = jnp.where(active, g_depth * w, 0.0)

        # --- pull back into record space via autodiff of chunk_hits ---
        def hit_fn(r):
            (kernel_degree, min_response, min_alpha, max_alpha, _,
             shared_origin) = cfg_static
            if shared_origin:
                a, ht = chunk_hits_fast(
                    r, ray_d, kernel_degree=kernel_degree,
                    min_response=min_response, min_alpha=min_alpha,
                    max_alpha=max_alpha)
            else:
                a, ht = chunk_hits(
                    r, ray_o, ray_d, kernel_degree=kernel_degree,
                    min_response=min_response, min_alpha=min_alpha,
                    max_alpha=max_alpha)
            in_range = (ht > tmin) & (ht < tmax)
            return jnp.where(in_range, a, 0.0), ht

        _, vjp_fn = jax.vjp(hit_fn, rec)
        (d_rec,) = vjp_fn((g_alpha, g_hit_t))
        # feature gradient: dL/df_jc = sum_pix g_feat_c * w_j -> [3,K]
        d_feat = jax.lax.dot_general(
            jnp.transpose(g_feat), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # (concatenate instead of .at[].set: scatter is unsupported in
        # Mosaic)
        d_rec = jnp.concatenate([
            d_rec[:_FEAT, :],
            d_rec[_FEAT:_FEAT + 3, :] + d_feat,
            d_rec[_FEAT + 3:, :],
        ], axis=0)

        grad_buf[:, :] = d_rec
        out_dma = pltpu.make_async_copy(grad_buf, grads_hbm.at[first + i],
                                        out_sem)
        out_dma.start()

        feat_acc = feat_acc + jax.lax.dot_general(
            w, feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        depth_acc = depth_acc + jnp.sum(w * hit_t, axis=1, keepdims=True)
        out_dma.wait()
        return i + 1, t_out, feat_acc, depth_acc

    init = (jnp.asarray(0, jnp.int32),
            jnp.ones((TILE_PIX, 1), jnp.float32),
            jnp.zeros((TILE_PIX, 3), jnp.float32),
            jnp.zeros((TILE_PIX, 1), jnp.float32))
    jax.lax.while_loop(cond, body, init)


# ---------------------------------------------------------------------------
# host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

def _pallas_forward(records, tile_start, rays, cfg_static, interpret):
    num_tiles = rays.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TILE_PIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_PIX, 8), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, RECORD_DIM, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg_static=cfg_static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, TILE_PIX, 8), jnp.float32),
        interpret=interpret,
    )(tile_start, records, rays)


def _pallas_backward(records, tile_start, rays, fwd_out, grad_out,
                     cfg_static, interpret):
    num_tiles = rays.shape[0]
    n_chunks = records.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TILE_PIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, RECORD_DIM, CHUNK), jnp.float32),
            pltpu.VMEM((RECORD_DIM, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg_static=cfg_static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, RECORD_DIM, CHUNK),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, records, rays, fwd_out, grad_out)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def rasterize_tiles(records: jnp.ndarray, tile_start: jnp.ndarray,
                    rays: jnp.ndarray, cfg_static: Tuple,
                    interpret: bool = False):
    """Composite chunk-aligned pair records over image tiles.

    Args:
        records: [C, 16, CHUNK] chunked pair records (module docstring).
        tile_start: [T+1] int32 CHUNK-aligned segment starts (pair units).
        rays: [T, 256, 8].
        cfg_static: (kernel_degree, min_response, min_alpha, max_alpha,
            min_transmittance, shared_origin) - hashable static tuple;
            shared_origin selects the fast record layout (chunk_hits_fast).
    Returns:
        [T, 256, 8] composited outputs.
    """
    return _pallas_forward(records, tile_start, rays, cfg_static, interpret)


def _rasterize_fwd(records, tile_start, rays, cfg_static, interpret):
    out = _pallas_forward(records, tile_start, rays, cfg_static, interpret)
    return out, (records, tile_start, rays, out)


def _rasterize_bwd(cfg_static, interpret, saved, grad_out):
    records, tile_start, rays, fwd_out = saved
    d_records = _pallas_backward(records, tile_start, rays, fwd_out,
                                 grad_out, cfg_static, interpret)
    # the kernel writes chunks [0, tile_start[-1]/CHUNK); the tail is
    # uninitialized
    n_chunks = records.shape[0]
    used = (jnp.arange(n_chunks, dtype=jnp.int32)[:, None, None]
            < tile_start[-1] // CHUNK)
    d_records = jnp.where(used, d_records, 0.0)
    return d_records, None, None


rasterize_tiles.defvjp(_rasterize_fwd, _rasterize_bwd)

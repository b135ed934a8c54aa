"""Pallas TPU tile-compositing kernels (forward + custom VJP).

TPU-native redesign of the reference per-tile renderer
(threedgut_tracer .../renderers/gutKBufferRenderer.cuh, K=0 "unsorted"
global-Z path, and its warp-scan `evalForwardNoKBufferBalanced`
:354-529): instead of one CUDA thread per pixel marching particles
serially, each grid program owns one 16x16 tile and processes its
depth-ordered candidate list in chunks of ``CHUNK`` particles at a time,
vectorized as [CHUNK, 256] VPU ops:

  alpha[K,256]   : full 3D ray/particle max-response (gaussianParticles
                   .slang:206-243 math) for all (candidate, pixel) pairs,
  prefix product : Hillis-Steele scan over the candidate axis replaces the
                   serial transmittance recurrence (the reference's
                   __shfl_up_sync scan, gutKBufferRenderer.cuh:455-460),
  accumulation   : weighted feature/depth sums reduced over the candidate
                   axis.

The backward kernel replays the same walk front-to-back using the
residual formulation of the reference (gaussianParticles.cuh:484-751:
grads from integrated totals, no per-hit storage), and obtains the
per-record gradients through ``jax.vjp`` of the same chunk function the
forward uses - JAX autodiff inside the kernel replaces the hand-derived
CUDA gradients and the Slang autodiff pipeline.

Data layout (built by threedgrut_tpu/render/gut.py):
  records   [P_total, 16] f32, pair-major, chunk-aligned per tile:
            0:3 pos | 3:7 quat (normalized wxyz) | 7:10 scale |
            10 density | 11:14 features (rgb) | 14:16 pad
  rays      [T, 8, 256] f32: rows 0-2 origin, 3-5 dir, 6 tmin, 7 tmax
  out       [T, 8, 256] f32: rows 0-2 feat, 3 alpha, 4 depth, 5 hits,
            6 final transmittance, 7 pad
Pair segments of each tile start at CHUNK-aligned offsets (padding slots
hold density=0 records), so chunk DMAs never straddle tiles and the
backward can write whole [CHUNK,16] gradient rows race-free.
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

# record field offsets
_POS = 0
_QUAT = 3
_SCALE = 7
_DENSITY = 10
_FEAT = 11


def _f(rec, i):
    """Extract record column i as a [K, 1] array."""
    return rec[:, i:i + 1]


def chunk_hits(rec, ray_o, ray_d, *, kernel_degree: int, min_response: float,
               min_alpha: float, max_alpha: float):
    """Alpha + hitT of K records against 256 rays -> ([K,256], [K,256]).

    rec: [K,16]; ray_o/ray_d: [3,256] rows. Differentiable w.r.t. rec.
    Same math as threedgrut_tpu.ops.hit.density_hit, laid out for the VPU.
    """
    ox, oy, oz = ray_o[0:1, :], ray_o[1:2, :], ray_o[2:3, :]
    dx, dy, dz = ray_d[0:1, :], ray_d[1:2, :], ray_d[2:3, :]

    qw, qx, qy, qz = (_f(rec, _QUAT), _f(rec, _QUAT + 1),
                      _f(rec, _QUAT + 2), _f(rec, _QUAT + 3))
    # rotation matrix entries (local->world), quaternions pre-normalized
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    r00, r01, r02 = 1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)
    r10, r11, r12 = 2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)
    r20, r21, r22 = 2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)

    px, py, pz = _f(rec, _POS), _f(rec, _POS + 1), _f(rec, _POS + 2)
    sx, sy, sz = _f(rec, _SCALE), _f(rec, _SCALE + 1), _f(rec, _SCALE + 2)
    inv_sx, inv_sy, inv_sz = 1.0 / sx, 1.0 / sy, 1.0 / sz

    # world->local is R^T v (column dot products)
    ex, ey, ez = ox - px, oy - py, oz - pz          # [K,256]
    gox = (r00 * ex + r10 * ey + r20 * ez) * inv_sx
    goy = (r01 * ex + r11 * ey + r21 * ez) * inv_sy
    goz = (r02 * ex + r12 * ey + r22 * ez) * inv_sz
    gux = (r00 * dx + r10 * dy + r20 * dz) * inv_sx
    guy = (r01 * dx + r11 * dy + r21 * dz) * inv_sy
    guz = (r02 * dx + r12 * dy + r22 * dz) * inv_sz

    inv_norm = jax.lax.rsqrt(jnp.maximum(gux * gux + guy * guy + guz * guz,
                                         1e-32))
    gdx, gdy, gdz = gux * inv_norm, guy * inv_norm, guz * inv_norm

    # cross(grd, gro)
    cx = gdy * goz - gdz * goy
    cy = gdz * gox - gdx * goz
    cz = gdx * goy - gdy * gox
    sq_dist = cx * cx + cy * cy + cz * cz

    response = particle_response(sq_dist, kernel_degree)
    density = _f(rec, _DENSITY)
    alpha = jnp.minimum(max_alpha, response * density)
    accept = (response > min_response) & (alpha > min_alpha)
    alpha = jnp.where(accept, alpha, 0.0)

    proj = -(gdx * gox + gdy * goy + gdz * goz)
    hx, hy, hz = sx * gdx * proj, sy * gdy * proj, sz * gdz * proj
    hit_t = jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-18))
    hit_t = jnp.where(proj < 0.0, -hit_t, hit_t)
    return alpha, hit_t


def _prefix_product_excl(x):
    """Exclusive prefix product along axis 0 (Hillis-Steele, static K)."""
    k = x.shape[0]
    ones = jnp.ones_like(x[:1])
    # shift down by one for exclusivity
    y = jnp.concatenate([ones, x[:-1]], axis=0)
    s = 1
    while s < k:
        shifted = jnp.concatenate([jnp.ones_like(y[:s]), y[:-s]], axis=0)
        y = y * shifted
        s *= 2
    return y


def _chunk_composite(rec, ray_o, ray_d, tmin, tmax, t_in, cfg_static):
    """One chunk of front-to-back compositing.

    Returns (w [K,256] hit weights, alpha_eff [K,256], hit_t [K,256],
    t_prev [K,256], t_out [1,256]).
    Differentiable in rec (via chunk_hits) given fixed masks are derived
    inside; matches gutKBufferRenderer.cuh evalForwardNoKBufferBalanced.
    """
    (kernel_degree, min_response, min_alpha, max_alpha, min_transmittance) = cfg_static
    alpha, hit_t = chunk_hits(rec, ray_o, ray_d, kernel_degree=kernel_degree,
                              min_response=min_response, min_alpha=min_alpha,
                              max_alpha=max_alpha)
    in_range = (hit_t > tmin) & (hit_t < tmax)
    alpha = jnp.where(in_range, alpha, 0.0)

    prefix = _prefix_product_excl(1.0 - alpha)        # [K,256]
    t_prev_raw = t_in * prefix
    alive = t_prev_raw >= min_transmittance           # kill semantics
    alpha_eff = jnp.where(alive, alpha, 0.0)
    # effective transmittance (frozen after kill)
    prefix_eff = _prefix_product_excl(1.0 - alpha_eff)
    t_prev = t_in * prefix_eff
    w = alpha_eff * t_prev
    t_out = t_prev[-1:] * (1.0 - alpha_eff[-1:])
    return w, alpha_eff, hit_t, t_prev, t_out


def _cumsum_incl(x):
    """Inclusive prefix sum along axis 0 (Hillis-Steele, static K)."""
    k = x.shape[0]
    y = x
    s = 1
    while s < k:
        shifted = jnp.concatenate([jnp.zeros_like(y[:s]), y[:-s]], axis=0)
        y = y + shifted
        s *= 2
    return y


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(tile_start_ref, records_hbm, rays_ref, out_ref,
                chunk_buf, sem, *, chunk: int, cfg_static):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    nchunks = (end - start) // chunk
    min_transmittance = cfg_static[4]

    ray_o = rays_ref[0, 0:3, :]
    ray_d = rays_ref[0, 3:6, :]
    tmin = rays_ref[0, 6:7, :]
    tmax = rays_ref[0, 7:8, :]

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            records_hbm.at[pl.ds(start + i * chunk, chunk), :],
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
        f0 = jnp.transpose(rec[:, _FEAT:_FEAT + 3])   # [3,K]
        feat = feat + jax.lax.dot_general(
            f0, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [3,256]
        depth = depth + jnp.sum(w * hit_t, axis=0, keepdims=True)
        hits = hits + jnp.sum((w > 0.0).astype(jnp.float32), axis=0,
                              keepdims=True)
        return i + 1, t_out, feat, depth, hits

    init = (jnp.asarray(0, jnp.int32),
            jnp.ones((1, TILE_PIX), jnp.float32),
            jnp.zeros((3, TILE_PIX), jnp.float32),
            jnp.zeros((1, TILE_PIX), jnp.float32),
            jnp.zeros((1, TILE_PIX), jnp.float32))
    i_end, t_fin, feat, depth, hits = jax.lax.while_loop(cond, body, init)

    # Early exit leaves the chunk-(i_end) DMA (prefetched by iteration
    # i_end-1) in flight; drain it so semaphore state stays balanced for
    # the next grid program.
    @pl.when((i_end > 0) & (i_end < nchunks))
    def _():
        get_dma(jax.lax.rem(i_end, 2), i_end).wait()

    out_ref[0, 0:3, :] = feat
    out_ref[0, 3:4, :] = 1.0 - t_fin
    out_ref[0, 4:5, :] = depth
    out_ref[0, 5:6, :] = hits
    out_ref[0, 6:7, :] = t_fin
    out_ref[0, 7:8, :] = jnp.zeros((1, TILE_PIX), jnp.float32)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(tile_start_ref, records_hbm, rays_ref, fwd_out_ref,
                grad_out_ref, dummy_out_ref, grads_hbm,
                chunk_buf, grad_buf, sem, out_sem, *, chunk: int, cfg_static):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    nchunks = (end - start) // chunk
    min_transmittance = cfg_static[4]

    ray_o = rays_ref[0, 0:3, :]
    ray_d = rays_ref[0, 3:6, :]
    tmin = rays_ref[0, 6:7, :]
    tmax = rays_ref[0, 7:8, :]

    feat_total = fwd_out_ref[0, 0:3, :]
    depth_total = fwd_out_ref[0, 4:5, :]
    t_final = fwd_out_ref[0, 6:7, :]

    g_feat = grad_out_ref[0, 0:3, :]
    # d/dT_final: row 3 is (1 - T), row 6 is T itself
    g_t = grad_out_ref[0, 6:7, :] - grad_out_ref[0, 3:4, :]
    g_depth = grad_out_ref[0, 4:5, :]

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            records_hbm.at[pl.ds(start + i * chunk, chunk), :],
            chunk_buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        i = state[0]
        return i < nchunks

    def body(state):
        i, t_cur, feat_acc, depth_acc = state
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            get_dma(1 - slot, i + 1).start()

        get_dma(slot, i).wait()
        rec = chunk_buf[slot]

        # --- replay forward chunk (non-diff values) ---
        w, alpha_eff, hit_t, t_prev, t_out = _chunk_composite(
            rec, ray_o, ray_d, tmin, tmax, t_cur, cfg_static)
        feats = jnp.transpose(rec[:, _FEAT:_FEAT + 3])          # [3,K]
        wf = w[:, None, :] * feats.T[:, :, None]                # [K,3,256]
        feat_upto = feat_acc[None] + _cumsum_incl(wf)           # [K,3,256]
        depth_upto = depth_acc + _cumsum_incl(w * hit_t)        # [K,256]
        t_after = t_prev * (1.0 - alpha_eff)

        # residuals (gaussianParticles.cuh:543-612): contribution of
        # everything *behind* hit j, replayed from integrated totals
        next_alive = t_after > min_transmittance
        safe_t_after = jnp.where(next_alive, t_after, 1.0)
        res_feat = jnp.where(
            next_alive[None], (feat_total[:, None] - jnp.moveaxis(feat_upto, 1, 0))
            / safe_t_after[None], 0.0)                          # [3,K,256]
        res_feat = jnp.maximum(res_feat, 0.0)
        res_depth = jnp.where(next_alive,
                              (depth_total - depth_upto) / safe_t_after, 0.0)
        res_depth = jnp.maximum(res_depth, 0.0)

        # dL/dalpha_j (cuh:557,587,624-627) summed over color channels
        active = alpha_eff > 0.0
        g_alpha = jnp.sum(
            g_feat[:, None, :] * t_prev[None]
            * (feats[:, :, None] - res_feat), axis=0)
        g_alpha = g_alpha + g_depth * t_prev * (hit_t - res_depth)
        residual_trm = jnp.where(alpha_eff < 0.999999,
                                 t_final / (1.0 - alpha_eff), t_prev)
        # dT_final/dalpha_j = -T_final / (1 - alpha_j)
        g_alpha = g_alpha - g_t * residual_trm
        g_alpha = jnp.where(active, g_alpha, 0.0)
        g_hit_t = jnp.where(active, g_depth * w, 0.0)

        # --- pull back into record space via autodiff of chunk_hits ---
        def hit_fn(r):
            kernel_degree, min_response, min_alpha, max_alpha, _ = cfg_static
            a, ht = chunk_hits(r, ray_o, ray_d, kernel_degree=kernel_degree,
                               min_response=min_response, min_alpha=min_alpha,
                               max_alpha=max_alpha)
            in_range = (ht > tmin) & (ht < tmax)
            return jnp.where(in_range, a, 0.0), ht

        _, vjp_fn = jax.vjp(hit_fn, rec)
        (d_rec,) = vjp_fn((g_alpha, g_hit_t))
        # feature gradient: dL/df_jc = sum_pix g_feat_c * w_j
        d_feat = jax.lax.dot_general(
            w, jnp.transpose(g_feat), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [K,3]
        d_rec = d_rec.at[:, _FEAT:_FEAT + 3].set(
            d_rec[:, _FEAT:_FEAT + 3] + d_feat)

        grad_buf[:, :] = d_rec
        out_dma = pltpu.make_async_copy(
            grad_buf, grads_hbm.at[pl.ds(start + i * chunk, chunk), :],
            out_sem)
        out_dma.start()

        feat_acc = feat_acc + jnp.sum(wf, axis=0)
        depth_acc = depth_acc + jnp.sum(w * hit_t, axis=0, keepdims=True)
        out_dma.wait()
        return i + 1, t_out, feat_acc, depth_acc

    init = (jnp.asarray(0, jnp.int32),
            jnp.ones((1, TILE_PIX), jnp.float32),
            jnp.zeros((3, TILE_PIX), jnp.float32),
            jnp.zeros((1, TILE_PIX), jnp.float32))
    jax.lax.while_loop(cond, body, init)
    dummy_out_ref[0, 0] = jnp.asarray(0, jnp.int32)


# ---------------------------------------------------------------------------
# host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

def _pallas_forward(records, tile_start, rays, chunk, cfg_static, interpret):
    num_tiles = rays.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, TILE_PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, TILE_PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, RECORD_DIM), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, cfg_static=cfg_static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, TILE_PIX), jnp.float32),
        interpret=interpret,
    )(tile_start, records, rays)


def _pallas_backward(records, tile_start, rays, fwd_out, grad_out, chunk,
                     cfg_static, interpret):
    num_tiles = rays.shape[0]
    p_total = records.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, TILE_PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TILE_PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TILE_PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda t, *_: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, RECORD_DIM), jnp.float32),
            pltpu.VMEM((chunk, RECORD_DIM), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    _, grads = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, cfg_static=cfg_static),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, 1), jnp.int32),
            jax.ShapeDtypeStruct((p_total, RECORD_DIM), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, records, rays, fwd_out, grad_out)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def rasterize_tiles(records: jnp.ndarray, tile_start: jnp.ndarray,
                    rays: jnp.ndarray, chunk: int,
                    cfg_static: Tuple, interpret: bool = False):
    """Composite chunk-aligned pair records over image tiles.

    Args:
        records: [P_total, 16] pair records (see module docstring).
        tile_start: [T+1] int32 chunk-aligned segment starts.
        rays: [T, 8, 256].
        chunk: static chunk length (multiple of 8).
        cfg_static: (kernel_degree, min_response, min_alpha, max_alpha,
            min_transmittance) - hashable static tuple.
    Returns:
        [T, 8, 256] composited outputs.
    """
    return _pallas_forward(records, tile_start, rays, chunk, cfg_static,
                           interpret)


def _rasterize_fwd(records, tile_start, rays, chunk, cfg_static, interpret):
    out = _pallas_forward(records, tile_start, rays, chunk, cfg_static,
                          interpret)
    return out, (records, tile_start, rays, out)


def _rasterize_bwd(chunk, cfg_static, interpret, saved, grad_out):
    records, tile_start, rays, fwd_out = saved
    d_records = _pallas_backward(records, tile_start, rays, fwd_out,
                                 grad_out, chunk, cfg_static, interpret)
    # the kernel writes rows [0, tile_start[-1]); the tail is uninitialized
    p_total = records.shape[0]
    used = jnp.arange(p_total, dtype=jnp.int32)[:, None] < tile_start[-1]
    d_records = jnp.where(used, d_records, 0.0)
    return d_records, None, None


rasterize_tiles.defvjp(_rasterize_fwd, _rasterize_bwd)

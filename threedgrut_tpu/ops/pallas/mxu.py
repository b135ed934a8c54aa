"""f32-accurate MXU contractions for Mosaic kernels.

Mosaic lowers a ``jax.lax.dot_general`` on f32 operands to ONE bf16 MXU
pass unless ``precision=HIGHEST`` is set (``HIGH`` raises
NotImplementedError in the Mosaic lowering): both operands are rounded
to 8 mantissa bits, ~2^-9 relative input error. That is pixel-scale
noise in rendering math — the round-4 probe measured the full forward
pipeline at 34.6 dB vs the f32 oracle — and HIGHEST (the MXU's fp32
contract mode) measured a 21.5 -> 13.3 it/s collapse on the headline
bench.

This module implements the classic two-term split emulation instead:

    x = hi(x) + lo(x),  hi(x) = bf16(x),  lo(x) = bf16(x - hi(x))

``hi``/``lo`` round-trip bf16 exactly, so each DEFAULT-precision pass
multiplies exact factors and the only error is the dropped tail terms:

    a @ b = a_hi@b_hi + a_hi@b_lo + a_lo@b_hi  (+ a_lo@b_lo + ...)

Three passes keep ~2^-17 relative error (the lo*lo term), two passes
suffice when one side is EXACTLY representable in bf16 — 0/1 masks,
iota-derived selectors, small integers — because its ``lo`` part is
identically zero. 2-3 fast passes beat the fp32 contract mode's ~6
while keeping gradient cosines vs exact f32 at >0.99999.

Trace-time knob: ``THREEDGRUT_MXU_F32MODE`` selects the mode for every
call without code edits:
  * ``emu`` (default) — the hi/lo split emulation above.
  * ``fp32`` — ``precision=HIGHEST`` (the exact-but-slow fp32 contract
    mode; measured 18.9 -> 13.3 it/s on the headline bench).
  * ``bf16`` — ONE default-precision pass (~2^-9 operand rounding,
    the round-4 forward-parity class, ~34.6 dB vs the f32 oracle at
    scene scale). NEVER a training mode (the round-4 regression);
    offered as a fwd-only fast-SERVING mode, the analogue of the
    reference's fp16 render buffers — pair with a measured quality
    delta (scripts/eval_fps.py --mxu-mode bf16 --save-frame).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_MODE = os.environ.get("THREEDGRUT_MXU_F32MODE", "emu")
_FP32_MODE = _MODE == "fp32"
_BF16_MODE = _MODE == "bf16"
# Default 1 (inexact adjoint) since round 5: the backward-only
# contractions run ONE bf16 pass. Validated on chip beyond the grad
# cosine (>= 0.9999999 on all 6 leaves, tests/tpu_battery.py cot): an
# 8k-step MCMC protocol at cot1 matched the exact-adjoint run's
# val PSNR to 0.04 dB (34.43 vs 34.39, runs/conv_mcmc_cot1_8k.log).
# Set THREEDGRUT_MXU_COT_PASSES=3 for the exact adjoint.
_COT_PASSES = int(os.environ.get("THREEDGRUT_MXU_COT_PASSES", "1"))


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (x - hi).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, lo


def dot_f32(a, b, dims, exact_lhs: bool = False, exact_rhs: bool = False):
    """``dot_general(a, b, dims)`` with f32-class accuracy on the MXU.

    ``exact_lhs``/``exact_rhs`` assert that the operand is exactly
    representable in bf16 (masks, 0/1 selectors): its split is skipped
    and the pass count drops (3 -> 2, or 1 when both are exact).
    """
    if _FP32_MODE:
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    if _BF16_MODE:
        return d(a, b)
    if exact_lhs and exact_rhs:
        return d(a, b)
    if exact_lhs:
        b_hi, b_lo = _hi_lo(b)
        return d(a, b_hi) + d(a, b_lo)
    if exact_rhs:
        a_hi, a_lo = _hi_lo(a)
        return d(a_hi, b) + d(a_lo, b)
    a_hi, a_lo = _hi_lo(a)
    b_hi, b_lo = _hi_lo(b)
    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def dot_cot(a, b, dims):
    """Contraction whose result is only ever a GRADIENT COTANGENT
    (pullback reductions: ray_d^T @ d_c maps, w^T @ g_feat, g_feat @ f).

    Defaults to the full :func:`dot_f32` emulation. The trace-time knob
    ``THREEDGRUT_MXU_COT_PASSES=1`` runs ONE default-precision bf16 pass
    instead: ~2^-9 relative input rounding confined to the gradient —
    the forward/loss stays bit-identical, so this is inexact-adjoint
    descent (grad-cosine vs the 3-pass adjoint measured >0.9999 on the
    bench scene), NOT the rejected records_bf16 class (which rounded
    forward geometry). Besides the 3x MXU-pass saving, pass=1 removes
    the hi/lo VPU splits on the pullback's widest operands
    ([256, 7K] cotangent concats).
    """
    if _FP32_MODE or _COT_PASSES >= 3:
        return dot_f32(a, b, dims)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)

"""MCMC densification strategy (3DGS-as-MCMC), static-capacity TPU port.

Behavioral contract from threedgrut/strategy/mcmc.py:50-224 and the
relocation CUDA kernel strategy/src/gaussian_mcmc.cu:36-69:
- relocate: dead (opacity <= threshold) particles teleport onto samples of
  the alive set drawn proportionally to opacity; the targets' opacity and
  scale are rescaled by the split-count binomial correction (Eq. 9 of the
  MCMC paper); optimizer moments of the sampled targets reset,
- add: grow 5%/step to the cap by the same sampling,
- perturb: positions get covariance-shaped noise scaled by
  op_sigmoid(1 - opacity) * noise_lr * current position lr.

The binomial relocation kernel becomes a closed-form vectorized jnp
computation over a precomputed binomial table - no custom kernel needed.
MCMC is the friendlier strategy for the static-capacity model: the count
only grows to a fixed cap and relocation is purely in-place.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.gaussians import (ACTIVATIONS, GaussianState,
                                INVERSE_ACTIVATIONS)
from ..optimizers.adam import AdamState
from ..ops.quaternion import quat_normalize, quat_to_rotmat
from . import base


@struct.dataclass
class MCMCStrategyConfig:
    """configs/strategy/mcmc.yaml."""
    binom_n_max: int = struct.field(pytree_node=False, default=51)
    opacity_threshold: float = struct.field(pytree_node=False, default=0.005)
    relocate_frequency: int = struct.field(pytree_node=False, default=100)
    relocate_start: int = struct.field(pytree_node=False, default=500)
    relocate_end: int = struct.field(pytree_node=False, default=25000)
    add_frequency: int = struct.field(pytree_node=False, default=100)
    add_start: int = struct.field(pytree_node=False, default=500)
    add_end: int = struct.field(pytree_node=False, default=25000)
    max_n_gaussians: int = struct.field(pytree_node=False, default=1000000)
    perturb_frequency: int = struct.field(pytree_node=False, default=1)
    perturb_start: int = struct.field(pytree_node=False, default=0)
    perturb_end: int = struct.field(pytree_node=False, default=27500)
    noise_lr: float = struct.field(pytree_node=False, default=5e5)


@functools.lru_cache(maxsize=None)
def _binom_table(n_max: int) -> np.ndarray:
    # numpy (not jnp): this is cached across jit traces and must never hold
    # a tracer
    return np.array([[math.comb(n, k) if k <= n else 0 for k in range(n_max)]
                     for n in range(n_max)], np.float32)


def compute_relocation(opacities: jnp.ndarray, scales: jnp.ndarray,
                       ratios: jnp.ndarray, n_max: int = 51):
    """Binomial opacity/scale rescale (gaussian_mcmc.cu:36-69), vectorized.

    opacities: [N] post-activation; scales: [N,3]; ratios: [N] int split
    counts clamped to [1, n_max].
    """
    binoms = jnp.asarray(_binom_table(n_max))
    ratios = jnp.clip(ratios, 1, n_max)
    new_op = 1.0 - jnp.power(1.0 - opacities, 1.0 / ratios.astype(jnp.float32))

    # denom = sum_{i=1..n} sum_{k=0..i-1} C(i-1,k) (-1)^k/sqrt(k+1) new_op^(k+1)
    ks = jnp.arange(n_max, dtype=jnp.float32)                      # [K]
    sign = jnp.power(-1.0, ks)
    term = (sign / jnp.sqrt(ks + 1.0))[None, :] \
        * jnp.power(new_op[:, None], ks[None, :] + 1.0)            # [N,K]
    # weight of term k = sum_{i=k+1..n} C(i-1,k) = cumulative binomial sum
    i_idx = jnp.arange(n_max)
    # cum_binom[n, k] = sum_{i=1..n} C(i-1, k)
    cum_binom = jnp.cumsum(binoms, axis=0)                         # [I,K]
    weights = cum_binom[ratios - 1]                                # [N,K]
    denom = jnp.sum(weights * term, axis=1)
    coeff = opacities / jnp.where(denom == 0.0, 1.0, denom)
    new_scales = coeff[:, None] * scales
    return new_op, new_scales


def _sample_targets(key, probs: jnp.ndarray, n_samples: int):
    """Multinomial-with-replacement via categorical over masked logits."""
    logits = jnp.log(jnp.maximum(probs, 1e-30))
    logits = jnp.where(probs > 0.0, logits, -jnp.inf)
    return jax.random.categorical(key, logits, shape=(n_samples,))


def _relocation_updates(state: GaussianState, sampled: jnp.ndarray,
                        move_mask: jnp.ndarray, dest_rows: jnp.ndarray,
                        n_max: int):
    """Shared math of relocate/add: ratios, rescales, scatter values.

    sampled: [C] target row per slot; move_mask: [C] slots that actually
    receive a copy; dest_rows: [C] destination row indices.
    Returns updated (params, sampled-target updates) applied to state.
    """
    cap = state.capacity
    densities = state.get_density()[:, 0]
    scales = state.get_scale()

    # ratio = 1 + number of copies landing on each target (mcmc.py:205)
    counts = jnp.zeros(cap, jnp.int32).at[sampled].add(
        move_mask.astype(jnp.int32))
    ratios = jnp.clip(counts[sampled] + 1, 1, n_max)

    new_op, new_scales = compute_relocation(
        densities[sampled], scales[sampled], ratios, n_max)
    new_op = jnp.clip(new_op, 0.005, 1.0 - 1.19e-7)
    raw_op = INVERSE_ACTIVATIONS[state.config.density_activation](new_op)
    raw_scale = INVERSE_ACTIVATIONS[state.config.scale_activation](
        jnp.maximum(new_scales, 1e-30))
    return ratios, raw_op[:, None], raw_scale


@functools.partial(jax.jit, static_argnames=("n_max", "opacity_threshold"))
def relocate(state: GaussianState, opt: AdamState, key,
             opacity_threshold: float = 0.005, n_max: int = 51):
    """mcmc.py:110-137: teleport dead particles onto opacity-weighted
    samples of the alive set; rescale both; zero moments of both."""
    cap = state.capacity
    active = state.active_mask()
    densities = state.get_density()[:, 0]
    dead = active & (densities <= opacity_threshold)
    alive = active & (densities > opacity_threshold)

    probs = jnp.where(alive, densities, 0.0)
    sampled = _sample_targets(key, probs, cap)  # [C] target per slot

    ratios, raw_op, raw_scale = _relocation_updates(
        state, sampled, dead, jnp.arange(cap), n_max)

    params = state.params

    def copy_rows(leaf):
        if leaf is None or leaf.ndim < 1 or leaf.shape[0] != cap:
            return leaf
        m = dead.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, leaf[sampled], leaf)

    # first write the rescale onto the sampled targets, then copy to dead
    dens2 = params.density.at[jnp.where(dead, sampled, cap)].set(
        raw_op, mode="drop")
    scale2 = params.scale.at[jnp.where(dead, sampled, cap)].set(
        raw_scale, mode="drop")
    params = params.replace(density=dens2, scale=scale2)
    params = jax.tree.map(lambda x: x, params)
    params = type(params)(**{
        k: copy_rows(getattr(params, k))
        for k in params.__dataclass_fields__})
    state = state.replace(params=params)

    # zero moments of dead rows and sampled targets (mcmc.py:128-131)
    touched = dead | (jnp.zeros(cap, bool).at[jnp.where(dead, sampled, cap)]
                      .set(True, mode="drop"))
    opt = base.reset_moments_rows(opt, touched)
    return state, opt, jnp.sum(dead.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_max", "max_n", "growth"))
def add_gaussians(state: GaussianState, opt: AdamState, key,
                  max_n: int = 1_000_000, growth: float = 1.05,
                  n_max: int = 51):
    """mcmc.py:139-167: grow count by 5% (to cap) by sampling the alive set."""
    cap = state.capacity
    n = state.n_active
    target = jnp.minimum(jnp.minimum(
        (growth * n.astype(jnp.float32)).astype(jnp.int32), max_n), cap)
    n_add = jnp.maximum(target - n, 0)

    densities = state.get_density()[:, 0]
    probs = jnp.where(state.active_mask(), densities, 0.0)
    sampled = _sample_targets(key, probs, cap)
    slot = jnp.arange(cap, dtype=jnp.int32)
    add_mask = slot < n_add

    ratios, raw_op, raw_scale = _relocation_updates(
        state, sampled, add_mask, slot, n_max)

    # rescale the sampled sources in place
    params = state.params
    dens2 = params.density.at[jnp.where(add_mask, sampled, cap)].set(
        raw_op, mode="drop")
    scale2 = params.scale.at[jnp.where(add_mask, sampled, cap)].set(
        raw_scale, mode="drop")
    params = params.replace(density=dens2, scale=scale2)
    state = state.replace(params=params)

    # new rows are copies of the (rescaled) sampled sources
    new_rows = {
        k: getattr(state.params, k)[sampled]
        for k in state.params.__dataclass_fields__
        if getattr(state.params, k) is not None
        and getattr(state.params, k).ndim >= 1
        and getattr(state.params, k).shape[0] == cap
    }
    # zero moments of sampled sources too
    touched = jnp.zeros(cap, bool).at[jnp.where(add_mask, sampled, cap)].set(
        True, mode="drop")
    opt = base.reset_moments_rows(opt, touched)
    state, opt, dropped = base.append_rows(state, opt, new_rows, add_mask)
    return state, opt, n_add


@jax.jit
def perturb(state: GaussianState, key, position_lr: jnp.ndarray,
            noise_lr: float = 5e5):
    """mcmc.py:168-187: covariance-shaped position noise on live particles."""
    cap = state.capacity
    densities = state.get_density()
    op_sig = 1.0 / (1.0 + jnp.exp(-100.0 * ((1.0 - densities) - 0.995)))
    noise = jax.random.normal(key, (cap, 3)) * op_sig * noise_lr * position_lr

    rot = quat_to_rotmat(quat_normalize(state.params.rotation))
    scale = state.get_scale()
    # covariance = R S S^T R^T
    rs = rot * scale[:, None, :]
    cov = jnp.einsum("nij,nkj->nik", rs, rs, precision="highest")
    noise = jnp.einsum("nij,nj->ni", cov, noise, precision="highest")
    noise = jnp.where(state.active_mask()[:, None], noise, 0.0)
    params = state.params.replace(positions=state.params.positions + noise)
    return state.replace(params=params)

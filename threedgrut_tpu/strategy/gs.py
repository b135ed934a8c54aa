"""Classic 3DGS densification strategy, static-capacity TPU redesign.

Behavioral contract from threedgrut/strategy/gs.py:26-328:
- gradient buffer: accumulate ||dL/dpos * dist_to_camera|| / 2 for
  particles with nonzero position grads (gs.py:130-141),
- clone: grad-norm >= clone_grad_threshold and max scale <= rel_size *
  scene_extent -> duplicate (gs.py:202),
- split: grad-norm >= split_grad_threshold and max scale > rel_size *
  scene_extent -> sample `n_split` offsets from the particle's own
  covariance, shrink scales by 1/(0.8*n) (gs.py:155),
- prune by opacity / scale screen footprint, density decay, density
  reset with optimizer-moment zeroing (gs.py:236-328).

All operations are pure jitted functions over the capacity arrays; counts
change via the append/compact primitives in strategy/base.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models.gaussians import (ACTIVATIONS, GaussianState,
                                INVERSE_ACTIVATIONS)
from ..optimizers.adam import AdamState
from ..ops.quaternion import quat_normalize, quat_to_rotmat
from . import base


@struct.dataclass
class GSStrategyConfig:
    """configs/strategy/gs.yaml."""
    densify_frequency: int = struct.field(pytree_node=False, default=300)
    densify_start: int = struct.field(pytree_node=False, default=500)
    densify_end: int = struct.field(pytree_node=False, default=15000)
    clone_grad_threshold: float = struct.field(pytree_node=False, default=0.0002)
    split_grad_threshold: float = struct.field(pytree_node=False, default=0.0002)
    relative_size_threshold: float = struct.field(pytree_node=False, default=0.01)
    split_n_gaussians: int = struct.field(pytree_node=False, default=2)
    prune_frequency: int = struct.field(pytree_node=False, default=100)
    prune_start: int = struct.field(pytree_node=False, default=500)
    prune_end: int = struct.field(pytree_node=False, default=15000)
    prune_density_threshold: float = struct.field(pytree_node=False, default=0.005)
    reset_density_frequency: int = struct.field(pytree_node=False, default=3000)
    reset_density_start: int = struct.field(pytree_node=False, default=0)
    reset_density_end: int = struct.field(pytree_node=False, default=15000)
    new_max_density: float = struct.field(pytree_node=False, default=0.01)
    density_decay_frequency: int = struct.field(pytree_node=False, default=0)
    density_decay_start: int = struct.field(pytree_node=False, default=-1)
    density_decay_end: int = struct.field(pytree_node=False, default=-1)
    density_decay_gamma: float = struct.field(pytree_node=False, default=0.99)
    prune_scale_frequency: int = struct.field(pytree_node=False, default=0)
    prune_scale_start: int = struct.field(pytree_node=False, default=-1)
    prune_scale_end: int = struct.field(pytree_node=False, default=-1)
    prune_scale_threshold: float = struct.field(pytree_node=False, default=1.0)
    # weight pruning (reference gs.py prune-by-max-contribution; off by
    # default there too). Telemetry renders sample views between prune
    # events and keep a running max (trainer.gs_weight_buf).
    prune_weight_frequency: int = struct.field(pytree_node=False, default=0)
    prune_weight_start: int = struct.field(pytree_node=False, default=-1)
    prune_weight_end: int = struct.field(pytree_node=False, default=-1)
    prune_weight_threshold: float = struct.field(pytree_node=False,
                                                 default=0.01)
    weight_telemetry_frequency: int = struct.field(pytree_node=False,
                                                   default=10)


class GSBuffers(NamedTuple):
    grad_norm_accum: jnp.ndarray  # [C]
    grad_norm_denom: jnp.ndarray  # [C] int32


def init_buffers(capacity: int) -> GSBuffers:
    return GSBuffers(jnp.zeros(capacity, jnp.float32),
                     jnp.zeros(capacity, jnp.int32))


@jax.jit
def update_gradient_buffer(buffers: GSBuffers, pos_grad: jnp.ndarray,
                           positions: jnp.ndarray,
                           sensor_position: jnp.ndarray) -> GSBuffers:
    """gs.py:130-141: accumulate camera-distance-scaled position-grad norms."""
    touched = jnp.any(pos_grad != 0.0, axis=1)
    dist = jnp.linalg.norm(positions - sensor_position, axis=1)
    norm = jnp.linalg.norm(pos_grad * dist[:, None], axis=1) / 2.0
    return GSBuffers(
        grad_norm_accum=buffers.grad_norm_accum + jnp.where(touched, norm, 0.0),
        grad_norm_denom=buffers.grad_norm_denom + touched.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_split",))
def densify(state: GaussianState, opt: AdamState, buffers: GSBuffers,
            scene_extent: float, rng_key, *,
            clone_grad_threshold: float = 0.0002,
            split_grad_threshold: float = 0.0002,
            relative_size_threshold: float = 0.01,
            n_split: int = 2):
    """Clone + split in one pass (gs.py:142-233).

    Returns (state, opt, buffers, stats dict).
    """
    cap = state.capacity
    active = state.active_mask()
    grad_norm = buffers.grad_norm_accum / jnp.maximum(
        buffers.grad_norm_denom.astype(jnp.float32), 1.0)
    grad_norm = jnp.where(buffers.grad_norm_denom > 0, grad_norm, 0.0)

    scale = state.get_scale()
    max_scale = jnp.max(scale, axis=1)
    big = max_scale > relative_size_threshold * scene_extent

    clone_mask = active & (grad_norm >= clone_grad_threshold) & ~big
    split_mask = active & (grad_norm >= split_grad_threshold) & big

    # --- clone: plain duplicates appended at the end (gs.py:202-233)
    state, opt, dropped_c = base.append_rows(state, opt, {}, clone_mask)

    # --- split: n_split samples from the particle's covariance; original
    # row is replaced by the first sample, the rest appended (gs.py:155-200)
    rot = quat_to_rotmat(quat_normalize(state.params.rotation))
    new_scale_raw = INVERSE_ACTIVATIONS[state.config.scale_activation](
        jnp.maximum(scale / (0.8 * n_split), 1e-30))

    keys = jax.random.split(rng_key, n_split)
    sampled_offsets = []
    for s in range(n_split):
        z = jax.random.normal(keys[s], (cap, 3)) * scale
        sampled_offsets.append(
            jnp.einsum("nij,nj->ni", rot, z, precision="highest"))

    # replace originals in place with sample 0
    pos0 = state.params.positions + sampled_offsets[0]
    params = state.params.replace(
        positions=jnp.where(split_mask[:, None], pos0,
                            state.params.positions),
        scale=jnp.where(split_mask[:, None], new_scale_raw,
                        state.params.scale))
    state = state.replace(params=params)
    # reference zeroes optimizer state of split particles (new rows AND the
    # rows that replaced originals, since originals are removed+rebuilt)
    opt = base.reset_moments_rows(opt, split_mask)

    dropped_s = jnp.asarray(0, jnp.int32)
    for s in range(1, n_split):
        new_rows = {
            "positions": state.params.positions - sampled_offsets[0]
                         + sampled_offsets[s],
            "scale": new_scale_raw,
        }
        state, opt, d = base.append_rows(state, opt, new_rows, split_mask)
        dropped_s = dropped_s + d

    buffers = init_buffers(cap)  # reset_densification_buffers (gs.py:306)
    stats = {"n_cloned": jnp.sum(clone_mask.astype(jnp.int32)),
             "n_split": jnp.sum(split_mask.astype(jnp.int32)),
             "n_dropped": dropped_c + dropped_s}
    return state, opt, buffers, stats


@jax.jit
def prune_opacity(state: GaussianState, opt: AdamState, buffers: GSBuffers,
                  threshold: float = 0.005):
    """gs.py:269: drop particles with post-activation density < threshold."""
    keep = state.active_mask() & (state.get_density()[:, 0] >= threshold)
    n_pruned = state.n_active - jnp.sum(keep.astype(jnp.int32))
    state, opt = base.compact(state, opt, keep)
    # buffers ride the same permutation as compact's
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    buffers = GSBuffers(buffers.grad_norm_accum[order],
                        buffers.grad_norm_denom[order])
    return state, opt, buffers, n_pruned


@jax.jit
def prune_weight(state: GaussianState, opt: AdamState, buffers: GSBuffers,
                 max_weights: jnp.ndarray, threshold: float = 0.01):
    """Drop particles whose max blend weight max_ray(alpha*T) over the
    sampled views stayed below threshold (reference gs.py weight prune;
    telemetry from render_gut(weight_telemetry=True))."""
    keep = state.active_mask() & (max_weights >= threshold)
    n_pruned = state.n_active - jnp.sum(keep.astype(jnp.int32))
    state, opt = base.compact(state, opt, keep)
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    buffers = GSBuffers(buffers.grad_norm_accum[order],
                        buffers.grad_norm_denom[order])
    return state, opt, buffers, n_pruned


@jax.jit
def prune_scale(state: GaussianState, opt: AdamState, buffers: GSBuffers,
                cam_normals: jnp.ndarray, focal_max: float,
                threshold: float = 1.0):
    """gs.py:252: prune particles whose minimum scale exceeds a screen-
    space footprint threshold (min-scale / camera distance * focal)."""
    sims = jnp.einsum("nc,mc->nm", state.params.positions, cam_normals,
                      precision="highest")
    cam_dists = jnp.clip(jnp.min(sims, axis=1), 1e-8, None)
    ratio = jnp.min(state.get_scale(), axis=1) / cam_dists * focal_max
    keep = state.active_mask() & (ratio < threshold)
    n_pruned = state.n_active - jnp.sum(keep.astype(jnp.int32))
    state, opt = base.compact(state, opt, keep)
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    buffers = GSBuffers(buffers.grad_norm_accum[order],
                        buffers.grad_norm_denom[order])
    return state, opt, buffers, n_pruned


@jax.jit
def reset_density(state: GaussianState, opt: AdamState,
                  new_max_density: float = 0.01):
    """gs.py:315: clamp raw density at inv_act(new_max) + zero moments."""
    inv = INVERSE_ACTIVATIONS[state.config.density_activation](
        jnp.asarray(new_max_density))
    params = state.params.replace(
        density=jnp.minimum(state.params.density, inv))
    # reference zeros ALL density moments (update_optimizer_fn zeros_like)
    exp_avg = dict(opt.exp_avg)
    exp_avg_sq = dict(opt.exp_avg_sq)
    exp_avg["density"] = jnp.zeros_like(exp_avg["density"])
    exp_avg_sq["density"] = jnp.zeros_like(exp_avg_sq["density"])
    opt = AdamState(step=opt.step, exp_avg=exp_avg, exp_avg_sq=exp_avg_sq)
    return state.replace(params=params), opt


@jax.jit
def decay_density(state: GaussianState, gamma: float = 0.99):
    """gs.py:311: densities <- inv_act(act(density) * gamma)."""
    act = ACTIVATIONS[state.config.density_activation]
    inv = INVERSE_ACTIVATIONS[state.config.density_activation]
    d = inv(jnp.clip(act(state.params.density) * gamma, 1e-10, 1.0 - 1e-7))
    return state.replace(params=state.params.replace(density=d))

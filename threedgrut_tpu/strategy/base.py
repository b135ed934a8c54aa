"""Strategy base: static-capacity parameter/optimizer-state surgery.

The reference mutates tensor sizes on densify/prune and rebuilds optimizer
state rows (threedgrut/strategy/base.py:77). On TPU all strategy ops are
pure jitted functions over fixed-capacity arrays:

- "append" scatters new rows at [n_active, n_active + k) via cumsum
  offsets (drops on capacity overflow, reported),
- "prune" compacts live rows to the front with a stable permutation,
- optimizer moments ride along with the same permutation / get zeroed for
  new rows, exactly like _update_param_with_optimizer.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState
from ..optimizers.adam import AdamState


def _tree_rows(tree, fn):
    """Apply fn to every [C, ...] row-array leaf (skipping None)."""
    return jax.tree.map(fn, tree)


def compact(state: GaussianState, opt: AdamState, keep: jnp.ndarray
            ) -> Tuple[GaussianState, AdamState]:
    """Move kept rows to the front (stable), update n_active.

    keep: [C] bool over capacity; rows >= n_active must already be False.
    """
    cap = state.capacity
    # stable permutation: kept rows first (by index), dropped rows after
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)

    def perm(x):
        return x[order] if (x is not None and x.ndim >= 1
                            and x.shape[0] == cap) else x

    new_params = _tree_rows(state.params, perm)
    new_opt = AdamState(step=opt.step,
                        exp_avg=_tree_rows(opt.exp_avg, perm),
                        exp_avg_sq=_tree_rows(opt.exp_avg_sq, perm))
    n = jnp.sum(keep.astype(jnp.int32))
    return state.replace(params=new_params, n_active=n), new_opt


def append_rows(state: GaussianState, opt: AdamState, new_rows: dict,
                add_mask: jnp.ndarray) -> Tuple[GaussianState, AdamState,
                                                jnp.ndarray]:
    """Append rows selected by add_mask at the end of the live region.

    new_rows: dict name -> [C, ...] candidate values; row i is appended
    iff add_mask[i]. Optimizer moments for appended rows are zeroed
    (strategy/base.py:77 update_optimizer_fn convention).
    Returns (state, opt, n_dropped_due_to_capacity).
    """
    cap = state.capacity
    n = state.n_active
    offsets = jnp.cumsum(add_mask.astype(jnp.int32)) - 1  # rank among added
    dest = jnp.where(add_mask, n + offsets, cap)          # cap -> dropped
    n_add = jnp.sum(add_mask.astype(jnp.int32))
    n_fit = jnp.minimum(n_add, cap - n)
    dropped = n_add - n_fit

    fields = {}
    for name in state.params.__dataclass_fields__:
        dst = getattr(state.params, name)
        if dst is None or dst.ndim < 1 or dst.shape[0] != cap:
            fields[name] = dst
            continue
        src = new_rows.get(name, dst)  # default: copy the source row
        fields[name] = dst.at[dest].set(src, mode="drop")
    new_params = type(state.params)(**fields)

    def zero_at_dest(leaf):
        if leaf is None or leaf.ndim < 1 or leaf.shape[0] != cap:
            return leaf
        zeros = jnp.zeros((cap,) + leaf.shape[1:], leaf.dtype)
        return leaf.at[dest].set(zeros, mode="drop")

    new_opt = AdamState(step=opt.step,
                        exp_avg=_tree_rows(opt.exp_avg, zero_at_dest),
                        exp_avg_sq=_tree_rows(opt.exp_avg_sq, zero_at_dest))
    return (state.replace(params=new_params, n_active=n + n_fit), new_opt,
            dropped)


def reset_moments_rows(opt: AdamState, mask: jnp.ndarray) -> AdamState:
    """Zero optimizer moments for masked rows (reset_density convention)."""
    def z(leaf):
        if leaf is None or leaf.ndim < 1 or leaf.shape[0] != mask.shape[0]:
            return leaf
        m = mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, 0.0, leaf)
    return AdamState(step=opt.step, exp_avg=_tree_rows(opt.exp_avg, z),
                     exp_avg_sq=_tree_rows(opt.exp_avg_sq, z))


def check_step_condition(step: int, start: int, end: int, frequency: int
                         ) -> bool:
    """threedgrut/utils/misc.py:212 semantics (host-side ints):
    fire when step > start (start >= 0), step < end (or end == -1), and
    step % frequency == 0."""
    if frequency <= 0:
        return False
    return ((start >= 0 and step > start)
            and (step < end or end == -1)
            and step % frequency == 0)

"""Per-group Adam + SelectiveAdam as functional optax-style transforms.

Replaces the reference's torch fused Adam + the SelectiveAdam CUDA kernel
(threedgrut/optimizers/__init__.py:45, optimizers/optimizers.cu:49-78):
SelectiveAdam updates (params AND moments) only for particles visible in
the current frame. On TPU this is a masked elementwise update - XLA fuses
it into one pass; no custom kernel needed.

Per-parameter-group learning rates/schedules mirror the config surface
configs/base_gs.yaml (optimizer.params.* / scheduler.*).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class AdamState(NamedTuple):
    step: jnp.ndarray
    exp_avg: dict     # pytree mirroring params
    exp_avg_sq: dict


def init_adam_state(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32),
                     exp_avg=zeros,
                     exp_avg_sq=jax.tree.map(jnp.zeros_like, params))


def adam_step(params, grads, state: AdamState, lrs: Dict[str, jnp.ndarray],
              *, betas=(0.9, 0.999), eps=1e-15,
              visibility: Optional[jnp.ndarray] = None,
              update_mask: Optional[jnp.ndarray] = None):
    """One (Selective)Adam step over a flat dict-like pytree of params.

    Args:
        lrs: per-leaf-name learning rate (traced scalars ok).
        visibility: optional [C] bool; when given, rows with False keep
            their params AND moment state untouched (SelectiveAdam,
            optimizers.cu:49-78).
        update_mask: optional [C] bool; rows with False are never updated
            (capacity mask for inactive particles).
    """
    b1, b2 = betas
    step = state.step + 1
    # bias corrections with the running step (matches torch.optim.Adam)
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    row_mask = None
    if visibility is not None:
        row_mask = visibility
    if update_mask is not None:
        row_mask = update_mask if row_mask is None else (row_mask & update_mask)

    names = list(params.keys())
    new_p, new_m, new_v = {}, {}, {}
    for name in names:
        lr = lrs[name]

        def leaf_update(p, g, m, v):
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * g * g
            p2 = p - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            if (row_mask is not None and p.ndim >= 1
                    and p.shape[0] == row_mask.shape[0]):
                mask = row_mask.reshape((-1,) + (1,) * (p.ndim - 1))
                p2 = jnp.where(mask, p2, p)
                m2 = jnp.where(mask, m2, m)
                v2 = jnp.where(mask, v2, v)
            return p2, m2, v2

        # each named group may be an array or an arbitrary pytree (e.g. a
        # flax param dict for the NHT decoder)
        triples = jax.tree.map(leaf_update, params[name], grads[name],
                               state.exp_avg[name], state.exp_avg_sq[name])
        flat, treedef = jax.tree.flatten(triples,
                                         is_leaf=lambda x: isinstance(x,
                                                                      tuple))
        new_p[name] = jax.tree.unflatten(treedef, [t[0] for t in flat])
        new_m[name] = jax.tree.unflatten(treedef, [t[1] for t in flat])
        new_v[name] = jax.tree.unflatten(treedef, [t[2] for t in flat])

    return new_p, AdamState(step=step, exp_avg=new_m, exp_avg_sq=new_v)


# --- LR schedules (threedgrut/utils/misc.py:91-126) ------------------------

def exp_scheduler(lr_init: float, lr_final: float, max_steps: int) -> Callable:
    def f(step):
        t = np.clip(step / max_steps, 0.0, 1.0)
        return float(np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t))
    return f


def cosine_scheduler(lr_init: float, lr_final: float, max_steps: int) -> Callable:
    def f(step):
        t = np.clip(step / max_steps, 0.0, 1.0)
        return float(lr_final + 0.5 * (lr_init - lr_final)
                     * (1 + np.cos(np.pi * t)))
    return f


def constant_scheduler(lr: float) -> Callable:
    return lambda step: float(lr)

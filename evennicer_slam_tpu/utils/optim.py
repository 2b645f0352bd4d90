"""Multi-group Adam with runtime-dynamic per-group learning rates.

The reference drives a single torch Adam whose param-group LRs are rewritten
every iteration according to the optimization stage
(reference src/Mapper.py:469-485); moments persist across stages within one
``optimize_map`` call and reset between calls (a fresh optimizer is built per
call, src/Mapper.py:393-434). This module reproduces those semantics
functionally: LRs are traced scalars (no recompilation when they change) and
the state is a pytree the caller re-initializes per mapping call.

Matches torch.optim.Adam exactly: bias-corrected moments,
``step = -lr * m_hat / (sqrt(v_hat) + eps)``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any            # first-moment pytree (like params)
    v: Any            # second-moment pytree
    t: jnp.ndarray    # step count (scalar int32)


def adam_init(params: Any) -> AdamState:
    return AdamState(
        jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.zeros_like, params),
        jnp.zeros((), jnp.int32),
    )


def adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lr_tree: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One Adam step. ``lr_tree`` is a scalar (uniform LR) or a pytree of
    per-leaf scalar LRs matching ``params``. Returns (params, state)."""
    t = state.t + 1
    tf = t.astype(jnp.float32)
    c1 = 1.0 - b1**tf
    c2 = 1.0 - b2**tf

    new_m = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g, grads, state.m)
    new_v = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g, grads, state.v)

    def step(p, m, v, lr):
        return p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps)

    if isinstance(lr_tree, (float, int)) or hasattr(lr_tree, "dtype"):
        new_params = jax.tree.map(
            lambda p, m, v: step(p, m, v, lr_tree), params, new_m, new_v
        )
    else:
        new_params = jax.tree.map(step, params, new_m, new_v, lr_tree)
    return new_params, AdamState(new_m, new_v, t)


def broadcast_group_lrs(labels: Any, group_lrs: Dict[str, Any]) -> Any:
    """Expand a {group_name: lr} dict onto a params-shaped ``labels`` pytree
    whose leaves are group-name strings."""
    return jax.tree.map(
        lambda label: group_lrs[label],
        labels,
        is_leaf=lambda x: isinstance(x, str),
    )

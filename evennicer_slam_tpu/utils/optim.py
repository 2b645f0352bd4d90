"""Multi-group Adam with runtime-dynamic per-group learning rates.

The reference drives a single torch Adam whose param-group LRs are rewritten
every iteration according to the optimization stage
(reference src/Mapper.py:469-485); moments persist across stages within one
``optimize_map`` call and reset between calls (a fresh optimizer is built per
call, src/Mapper.py:393-434). This module reproduces those semantics
functionally: LRs are traced scalars (no recompilation when they change) and
the state is a pytree the caller re-initializes per mapping call.

Matches torch.optim.Adam exactly: bias-corrected moments,
``step = -lr * m_hat / (sqrt(v_hat) + eps)`` — including torch's *lazy
per-parameter state*: ``Adam.step()`` skips any parameter whose ``.grad`` is
None, so a parameter first touched by the loss graph at stage boundary k has
bias corrections as if it had just started stepping (its own ``step``
counter), not the global iteration count. Callers that optimize different
parameter subsets per stage (the mapper: fine/color grids enter at the
fine/color stage boundaries, reference src/Mapper.py:469-485 with grads
appearing only when NICE.forward reads the level) pass an ``active`` pytree
of static Python bools and use a per-leaf ``t`` (``adam_init(...,
per_leaf_t=True)``): inactive leaves are passed through untouched — zero
compute, exactly torch's ``p.grad is None: continue``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any            # first-moment pytree (like params)
    v: Any            # second-moment pytree
    t: Any            # step count: scalar int32, or per-leaf pytree of them


def adam_init(params: Any, per_leaf_t: bool = False) -> AdamState:
    return AdamState(
        jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(lambda _: jnp.zeros((), jnp.int32), params)
        if per_leaf_t else jnp.zeros((), jnp.int32),
    )


def adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lr_tree: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    active: Any = None,
):
    """One Adam step. ``lr_tree`` is a scalar (uniform LR) or a pytree of
    per-leaf scalar LRs matching ``params``. Returns (params, state).

    ``active``: optional params-shaped pytree of *static Python bools* —
    torch's ``p.grad is None`` skip. Inactive leaves keep p/m/v/t untouched
    (no ops emitted). Requires a per-leaf ``t``
    (``adam_init(params, per_leaf_t=True)``); each active leaf advances its
    own step count, reproducing torch's lazy per-parameter Adam state when
    the optimized subset changes across stages."""
    if active is not None:
        def upd(act, g, p, m, v, t, lr):
            if not act:
                return p, m, v, t
            t = t + 1
            tf = t.astype(jnp.float32)
            c1 = 1.0 - b1**tf
            c2 = 1.0 - b2**tf
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            p = p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
            return p, m, v, t

        if isinstance(lr_tree, (float, int)) or hasattr(lr_tree, "dtype"):
            lr_tree = jax.tree.map(lambda _: lr_tree, params)
        out = jax.tree.map(
            upd, active, grads, params, state.m, state.v, state.t, lr_tree,
        )
        # unzip the 4-tuple leaves back into (params, m, v, t) pytrees
        is_4 = lambda x: isinstance(x, tuple) and len(x) == 4 and not isinstance(x[0], tuple)
        new_params = jax.tree.map(lambda o: o[0], out, is_leaf=is_4)
        new_m = jax.tree.map(lambda o: o[1], out, is_leaf=is_4)
        new_v = jax.tree.map(lambda o: o[2], out, is_leaf=is_4)
        new_t = jax.tree.map(lambda o: o[3], out, is_leaf=is_4)
        return new_params, AdamState(new_m, new_v, new_t)

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

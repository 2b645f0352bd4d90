"""utils/optim.py vs torch.optim.Adam — including torch's lazy per-parameter
state.

The reference drives one torch Adam per mapping call whose param-group LRs
are rewritten per optimization stage (reference src/Mapper.py:469-485);
``Adam.step()`` skips any param whose ``.grad`` is None, so a param first
read by the loss at a stage boundary starts its OWN step counter there.
``adam_update(active=...)`` must reproduce that exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from evennicer_slam_tpu.utils.optim import AdamState, adam_init, adam_update


def test_adam_matches_torch_uniform():
    """Scalar-t path: every param active every step (the tracker's case)."""
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=1e-2)

    jp = jnp.asarray(p0)
    state = adam_init(jp)
    for i in range(7):
        g = rng.normal(size=p0.shape).astype(np.float32)
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        jp, state = adam_update(jnp.asarray(g), state, jp, 1e-2)
    # torch evaluates sqrt(v)/sqrt(c2)+eps, we sqrt(v/c2)+eps — same math,
    # different f32 rounding order
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                               rtol=3e-5, atol=1e-6)


def test_adam_active_matches_torch_lazy_state():
    """Per-leaf-t path vs torch: param 'b' joins at step 4 (its grad is None
    before — torch skips it and starts its bias correction at its own step 1),
    param 'a' steps throughout with a per-'stage' LR switch."""
    rng = np.random.default_rng(1)
    a0 = rng.normal(size=(4,)).astype(np.float32)
    b0 = rng.normal(size=(3, 2)).astype(np.float32)

    ta = torch.nn.Parameter(torch.from_numpy(a0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.Adam([{"params": [ta], "lr": 0.0},
                            {"params": [tb], "lr": 0.0}])

    params = {"a": jnp.asarray(a0), "b": jnp.asarray(b0)}
    state = adam_init(params, per_leaf_t=True)

    for i in range(10):
        stage2 = i >= 4
        lr_a, lr_b = (1e-3, 5e-3) if stage2 else (2e-3, 0.0)
        ga = rng.normal(size=a0.shape).astype(np.float32)
        gb = rng.normal(size=b0.shape).astype(np.float32)

        opt.zero_grad(set_to_none=True)
        ta.grad = torch.from_numpy(ga.copy())
        if stage2:  # before stage 2 the loss never reads b: grad stays None
            tb.grad = torch.from_numpy(gb.copy())
        opt.param_groups[0]["lr"] = lr_a
        opt.param_groups[1]["lr"] = lr_b
        opt.step()

        grads = {"a": jnp.asarray(ga), "b": jnp.asarray(gb)}
        lrs = {"a": jnp.asarray(lr_a), "b": jnp.asarray(lr_b)}
        active = {"a": True, "b": stage2}
        params, state = adam_update(grads, state, params, lrs, active=active)

    np.testing.assert_allclose(np.asarray(params["a"]), ta.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
    # b's own step counter: 6 active steps, not 10 global ones
    assert int(state.t["b"]) == 6
    assert int(state.t["a"]) == 10


def test_adam_inactive_leaf_untouched():
    params = {"x": jnp.ones((3,)), "y": jnp.full((2,), 7.0)}
    state = adam_init(params, per_leaf_t=True)
    grads = {"x": jnp.ones((3,)), "y": jnp.ones((2,))}
    new_p, new_s = adam_update(grads, state, params, 1e-2,
                               active={"x": True, "y": False})
    np.testing.assert_array_equal(np.asarray(new_p["y"]), np.full((2,), 7.0))
    np.testing.assert_array_equal(np.asarray(new_s.m["y"]), np.zeros((2,)))
    assert int(new_s.t["y"]) == 0
    assert not np.allclose(np.asarray(new_p["x"]), 1.0)


def test_adam_active_under_jit_and_fori():
    """active bools are static: the whole stage loop jits with them baked in
    (the mapper's usage)."""
    params = (jnp.ones((4,)), jnp.ones((4,)))
    active = (True, False)

    @jax.jit
    def run(params):
        state = adam_init(params, per_leaf_t=True)

        def body(i, carry):
            p, s = carry
            g = jax.tree.map(jnp.ones_like, p)
            return adam_update(g, s, p, 1e-2, active=active)

        return jax.lax.fori_loop(0, 5, body, (params, state))

    (p, s) = run(params)
    assert int(s.t[0]) == 5 and int(s.t[1]) == 0
    np.testing.assert_array_equal(np.asarray(p[1]), np.ones((4,)))

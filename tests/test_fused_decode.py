"""Fast (packed-corner, bf16) decode vs reference XLA path: forward +
gradient parity within bf16 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from evennicer_slam_tpu.models.decoders import init_nice_decoders, nice_forward
from evennicer_slam_tpu.models.grids import init_grids

BOUND = np.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]], np.float32)


def setup():
    decoders = init_nice_decoders(jax.random.PRNGKey(0), coarse=False)
    grids = init_grids(
        jax.random.PRNGKey(1), BOUND,
        {"coarse": 0.8, "middle": 0.4, "fine": 0.2, "color": 0.2},
        c_dim=32, coarse=False,
    )
    p = jax.random.uniform(jax.random.PRNGKey(2), (301, 3), minval=-0.9, maxval=0.9)
    return decoders, grids, p


class TestFusedDecode:
    def test_forward_parity(self):
        decoders, grids, p = setup()
        bound = jnp.asarray(BOUND)
        ref = nice_forward(decoders, grids, p, bound, "color", fused=False)
        out = nice_forward(decoders, grids, p, bound, "color", fused=True)
        # packed path gathers/matmuls in bf16: ~1e-2 relative tolerance
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.05, atol=0.05)

    def test_gradient_parity_points(self):
        decoders, grids, p = setup()
        bound = jnp.asarray(BOUND)

        def loss(p, grids, fused):
            raw = nice_forward(decoders, grids, p, bound, "color", fused=fused)
            return jnp.sum(raw**2)

        gp_ref = np.asarray(jax.grad(lambda pp: loss(pp, grids, False))(p)).ravel()
        gp_fused = np.asarray(jax.grad(lambda pp: loss(pp, grids, True))(p)).ravel()
        # bf16 hidden-layer matmuls add per-entry noise; what matters for the
        # pose optimizer is the gradient DIRECTION and magnitude
        cos = gp_ref @ gp_fused / (np.linalg.norm(gp_ref) * np.linalg.norm(gp_fused))
        assert cos > 0.995, cos
        ratio = np.linalg.norm(gp_fused) / np.linalg.norm(gp_ref)
        assert 0.9 < ratio < 1.1, ratio

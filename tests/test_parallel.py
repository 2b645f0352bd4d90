"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import numpy as np


class TestMultichip:
    def test_mesh_shape(self):
        from evennicer_slam_tpu.parallel.tp_example import make_mesh

        mesh = make_mesh(8)
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("dp", "tp")

    def test_dryrun_entrypoint(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_sharded_step_matches_single_device(self):
        """The dp+tp sharded training step must be numerically equivalent to
        the unsharded computation."""
        import __graft_entry__ as g
        from evennicer_slam_tpu.parallel.tp_example import (
            init_multichip_state,
            make_mesh,
            multichip_train_step,
        )
        from evennicer_slam_tpu.render.renderer import RenderSettings
        from evennicer_slam_tpu.utils.optim import adam_init

        settings = RenderSettings()
        grids, decoders, bound, rays_o, rays_d, gt_depth, gt_color = g._tiny_scene()

        mesh = make_mesh(8)
        sg, sd, st = init_multichip_state(mesh, grids, decoders)
        _, _, _, loss_sharded = multichip_train_step(
            mesh, sg, sd, st, rays_o, rays_d, gt_depth, gt_color, bound, settings
        )

        mesh1 = make_mesh(1)
        g1, d1, s1 = init_multichip_state(mesh1, grids, decoders)
        _, _, _, loss_single = multichip_train_step(
            mesh1, g1, d1, s1, rays_o, rays_d, gt_depth, gt_color, bound, settings
        )
        np.testing.assert_allclose(
            float(loss_sharded), float(loss_single), rtol=1e-5
        )

    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        for o in out:
            assert np.isfinite(np.asarray(o)).all()

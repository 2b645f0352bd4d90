"""Production-pipeline data parallelism: 8-device CPU-mesh correctness.

The dp sharding (parallel/sharding.pipeline_dp_sharding) is a pure GSPMD
annotation on the tracker/mapper ray batches — same program, same sample
keys; only the reduction tree changes, so a SINGLE tracked/mapped call must
match the unsharded call to float-reassociation precision. Over a full
multi-frame run those ~1e-6 differences feed back through Adam and the
map->track loop and amplify, so the end-to-end check is a trajectory-level
sanity bound rather than bitwise equality (VERDICT round 1, item 2).
"""

import numpy as np

from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM

from test_slam import tiny_cfg


def _build(tmp_path, sub, dp):
    cfg = tiny_cfg(tmp_path / sub, events=True)
    cfg["parallel"] = {"data_parallel": dp}
    slam = EvenNICERSLAM(cfg, nice=True)
    assert slam.use_events
    if dp > 1:
        assert slam.dp_sharding is not None
        assert slam.dp_sharding.mesh.devices.size == dp
    else:
        assert slam.dp_sharding is None
    return slam


def test_single_calls_match(tmp_path):
    """One tracked frame and one mapping call: dp=8 == dp=1 to ~1e-5."""
    s1 = _build(tmp_path, "dp1", 1)
    s8 = _build(tmp_path, "dp8", 8)

    # identical initial state by construction (same seed/config)
    for k in s1.grids:
        np.testing.assert_array_equal(np.asarray(s1.grids[k]),
                                      np.asarray(s8.grids[k]))

    # frame 0: first mapping call
    s1.step(0)
    s8.step(0)
    for k in s1.grids:
        np.testing.assert_allclose(
            np.asarray(s8.grids[k]), np.asarray(s1.grids[k]),
            atol=5e-5, err_msg=f"grid {k} after first map",
        )

    # frame 1: one tracked frame on the (now near-identical) map
    s1.step(1)
    s8.step(1)
    np.testing.assert_allclose(
        s8.estimate_c2w_list[1], s1.estimate_c2w_list[1], atol=5e-4
    )


def test_dp8_full_run_trajectory(tmp_path):
    """Full tiny sequence under dp=8: same SLAM up to reassociation drift."""
    s1 = _build(tmp_path, "full1", 1)
    est1 = np.asarray(s1.run(mesh=False, checkpoint=False))
    s8 = _build(tmp_path, "full8", 8)
    est8 = np.asarray(s8.run(mesh=False, checkpoint=False))
    n = s1.n_img
    assert np.isfinite(est8[:n]).all()
    # trajectories agree to well under the fixture's motion scale (2 cm/frame)
    dt = np.linalg.norm(est8[:n, :3, 3] - est1[:n, :3, 3], axis=-1)
    assert dt.max() < 2e-2, dt

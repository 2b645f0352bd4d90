"""Production-pipeline data parallelism: 8-device CPU-mesh correctness.

The dp sharding (parallel/sharding.pipeline_dp_sharding) is a pure GSPMD
annotation on the tracker/mapper ray batches — same program, same sample
keys; only the reduction tree changes, so a SINGLE tracked/mapped call must
match the unsharded call to float-reassociation precision. Over a full
multi-frame run those ~1e-6 differences feed back through Adam and the
map->track loop and amplify, so the end-to-end check is a trajectory-level
sanity bound rather than bitwise equality (VERDICT round 1, item 2).
"""

import re

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

    # frame 0: first mapping call. Tolerance: the only difference is the
    # psum reduction tree, ~1e-7 per step, but Adam's rsqrt amplifies it
    # over the 1500 first-map iterations — measured max |Δ| is ~1e-5..1e-4
    # depending on scene content (2e-4 bound); a structural error (e.g. a
    # wrong psum scale) would be O(grid values) ~1e-2.
    s1.step(0)
    s8.step(0)
    for k in s1.grids:
        np.testing.assert_allclose(
            np.asarray(s8.grids[k]), np.asarray(s1.grids[k]),
            atol=2e-4, err_msg=f"grid {k} after first map",
        )

    # frame 1: one tracked frame on the (now near-identical) map
    s1.step(1)
    s8.step(1)
    np.testing.assert_allclose(
        s8.estimate_c2w_list[1], s1.estimate_c2w_list[1], atol=5e-4
    )


def _collective_sizes(hlo_text: str, op: str):
    """Total element count of each ``op`` instruction's result(s) in
    post-SPMD-partitioning HLO text."""
    sizes = []
    for line in hlo_text.splitlines():
        if f" {op}(" not in line:
            continue
        lhs = line.split(f" {op}(")[0]
        total = 0
        for dims in re.findall(r"\[([0-9,]*)\]", lhs):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n
        sizes.append(total)
    return sizes


def _capture_compiled(module, fn_name, trigger):
    """Run ``trigger`` with ``module.fn_name`` wrapped to capture its args,
    then return the compiled post-partitioning HLO for that exact call."""
    orig = getattr(module, fn_name)
    captured = {}

    def spy(*a, **k):
        captured["a"], captured["k"] = a, k
        return orig(*a, **k)

    setattr(module, fn_name, spy)
    try:
        trigger()
    finally:
        setattr(module, fn_name, orig)
    assert captured, f"{fn_name} was never called"
    return orig.lower(*captured["a"], **captured["k"]).compile().as_text()


def _build_hlo(tmp_path, sub, dp):
    """dp pipeline whose grids are much larger than any ray batch, so a
    size threshold cleanly separates legitimate ray-sized collectives
    (sharding-boundary gathers of a few thousand elements) from an
    accidental grid-sized one."""
    cfg = tiny_cfg(
        tmp_path / sub, events=True,
        grid_len={"coarse": 0.3, "middle": 0.15, "fine": 0.08, "color": 0.08,
                  "bound_divisible": 0.2},
    )
    cfg["parallel"] = {"data_parallel": dp}
    slam = EvenNICERSLAM(cfg, nice=True)
    min_grid = min(int(np.prod(g.shape)) for g in slam.grids.values())
    # ray-derived tensors (and their GSPMD resharding collectives) top out
    # ~23k elements in this cfg; grids start at ~60k
    assert min_grid > 2 * 32768, f"fixture grids too small: {min_grid}"
    return slam, 32768


def test_tracker_hlo_no_big_collectives(tmp_path):
    """Structural pin on the dp-sharded tracker (VERDICT r2 item 5): rays
    shard per device, the frozen grids/decoders are NEVER all-gathered or
    re-reduced inside the iteration scan, and the only cross-device traffic
    is the small psum of per-iteration loss/pose-gradient terms (plus
    ray-sized sharding-boundary gathers). Fails if someone introduces a
    grid-sized collective into the hot loop."""
    import evennicer_slam_tpu.slam.tracker as trk

    s8, small = _build_hlo(tmp_path, "hlo8", 8)
    s8.step(0)
    txt = _capture_compiled(trk, "track_frame_jit", lambda: s8.step(1))

    ag = _collective_sizes(txt, "all-gather")
    ar = _collective_sizes(txt, "all-reduce")
    a2a = _collective_sizes(txt, "all-to-all")
    assert not a2a, f"unexpected all-to-all: {a2a}"
    assert all(s <= small for s in ag), f"grid-sized all-gather in tracker: {ag}"
    assert ar, "no psum found - dp sharding is not active in the tracker"
    assert all(s <= small for s in ar), f"grid-sized all-reduce in tracker: {ar}"


def test_mapper_hlo_grids_stay_sharded_or_local(tmp_path):
    """The mapper's dp semantics NEED one grid-gradient psum per step (that
    is the data-parallel gradient sync), but the grids/decoders themselves
    must never be all-gathered in the loop: parameters are replicated, only
    ray-derived tensors shard."""
    import evennicer_slam_tpu.slam.mapper as mpr

    s8, small = _build_hlo(tmp_path, "hlo8m", 8)
    s8.step(0)
    s8.step(1)
    txt = _capture_compiled(mpr, "map_frame_jit", lambda: s8.step(2))

    ag = _collective_sizes(txt, "all-gather")
    assert all(s <= small for s in ag), f"grid-sized all-gather in mapper: {ag}"
    ar = _collective_sizes(txt, "all-reduce")
    assert ar, "no psum found - dp sharding is not active in the mapper"


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

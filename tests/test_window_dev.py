"""Device-side window selection / assembly / BA write-back (the
grown-registry async fast path, keyframes.py select_assemble_window_dev /
scatter_window_poses_dev / KeyframeStore device stacks)."""

import jax
import jax.numpy as jnp
import numpy as np

from evennicer_slam_tpu.core.quaternion import (
    pose_matrix_from_tensor_np,
    tensor_from_pose_matrix_np,
)
from evennicer_slam_tpu.slam.camera import Camera
from evennicer_slam_tpu.slam.keyframes import (
    KeyframeStore,
    keyframe_selection_overlap,
    scatter_window_poses_dev,
    select_assemble_window_dev,
)

CAM = Camera(48, 64, 40.0, 40.0, 32.0, 24.0)


def _pose(t, flip=False):
    m = np.eye(4, dtype=np.float32)
    if flip:
        # rotate 180 deg about y: looks along +z instead of -z
        m[0, 0] = -1.0
        m[2, 2] = -1.0
    m[:3, 3] = t
    return m


def _store(poses, H=48, W=64):
    store = KeyframeStore()
    rng = np.random.default_rng(0)
    for i, p in enumerate(poses):
        store.append(
            i, rng.random((H, W, 3), np.float32).astype(np.float32),
            np.full((H, W), 1.0, np.float32),
            np.zeros((H, W, 2), np.float32), p, p,
        )
    return store


class TestDeviceSelection:
    def test_selects_only_overlapping_candidates(self):
        """Candidates looking the opposite way score zero overlap and are
        never selected while enough co-looking candidates exist (reference
        nonzero-overlap rule, src/Mapper.py:244-250)."""
        cur = _pose([0.0, 0.0, 1.0])
        poses = [
            _pose([0.0, 0.0, 1.0], flip=True),   # 0: looks away -> score 0
            _pose([0.05, 0.0, 1.0]),             # 1: co-located
            _pose([0.0, 0.05, 1.0]),             # 2: co-located
            _pose([0.0, 0.0, 1.05]),             # 3: co-located
            _pose([0.0, 0.0, 0.95]),             # 4: last kf (always in)
        ]
        store = _store(poses)
        cols, deps, kf_poses = store.device_stack()
        for seed in range(4):
            out = select_assemble_window_dev(
                jax.random.PRNGKey(seed), cols, deps, kf_poses,
                cols[4], deps[4], jnp.asarray(cur), 2, CAM,
            )
            colors, depths, fixed, cams, window_idx, opt_mask = out
            widx = np.asarray(window_idx)
            assert widx[-1] == 4  # last keyframe always included
            assert set(widx[:-1]).issubset({1, 2, 3})
            # K = k_sel + 2 slots; current frame appended last
            assert colors.shape[0] == 4
            np.testing.assert_allclose(
                np.asarray(fixed)[-1], cur, atol=1e-6
            )
            # gauge anchor = oldest keyframe in the window
            om = np.asarray(opt_mask)
            assert om[np.argmin(widx)] == 0.0
            assert om.sum() == len(om) - 1

    def test_cam_tensors_roundtrip(self):
        poses = [_pose([0.1 * i, 0.0, 1.0]) for i in range(3)]
        store = _store(poses)
        cols, deps, kf_poses = store.device_stack()
        out = select_assemble_window_dev(
            jax.random.PRNGKey(0), cols, deps, kf_poses,
            cols[0], deps[0], jnp.asarray(_pose([0.0, 0.0, 1.0])), 1, CAM,
        )
        _, _, fixed, cams, _, _ = out
        for slot in range(fixed.shape[0]):
            back = pose_matrix_from_tensor_np(np.asarray(cams[slot]))
            np.testing.assert_allclose(
                back, np.asarray(fixed[slot])[:3], atol=1e-5
            )

    def test_matches_host_scorer_ranking(self):
        """With graded overlaps, the device path must never select a
        zero-overlap candidate that the host scorer also scores zero."""
        cur = _pose([0.0, 0.0, 1.0])
        poses = [
            _pose([0.0, 0.0, 1.0], flip=True),
            _pose([0.0, 0.0, 1.0], flip=True),
            _pose([0.02, 0.0, 1.0]),
            _pose([0.0, 0.0, 1.0]),
        ]
        store = _store(poses)
        rng = np.random.default_rng(1)
        host_sel = keyframe_selection_overlap(
            store.frames[3]["color"], store.frames[3]["depth"], cur,
            store.frames[:-1], 1, CAM, rng=rng,
        )
        assert set(host_sel).issubset({2})
        cols, deps, kf_poses = store.device_stack()
        out = select_assemble_window_dev(
            jax.random.PRNGKey(2), cols, deps, kf_poses,
            cols[3], deps[3], jnp.asarray(cur), 1, CAM,
        )
        widx = np.asarray(out[4])
        assert widx[0] == 2 and widx[-1] == 3


class TestDeviceScatter:
    def test_anchor_kept_and_current_returned(self):
        poses = [_pose([0.1 * i, 0.0, 1.0]) for i in range(5)]
        store = _store(poses)
        _, _, kf_poses = store.device_stack()
        window_idx = jnp.asarray(np.array([2, 1, 4], np.int32))
        fixed = jnp.concatenate(
            [kf_poses[window_idx],
             jnp.asarray(_pose([0.0, 0.5, 1.0]))[None]], axis=0
        )
        opt_mask = jnp.asarray(np.array([1.0, 0.0, 1.0, 1.0], np.float32))
        new_cams = jnp.stack([
            jnp.asarray(tensor_from_pose_matrix_np(
                _pose([9.0 + i, 0.0, 0.0])[:3]))
            for i in range(4)
        ])
        new_poses, new_cur = scatter_window_poses_dev(
            kf_poses, window_idx, new_cams, fixed, opt_mask
        )
        got = np.asarray(new_poses)
        # slot 1 (store row 1) anchored: original pose kept
        np.testing.assert_allclose(got[1], poses[1], atol=1e-5)
        # slots 0/2 (store rows 2/4) updated
        np.testing.assert_allclose(got[2][:3, 3], [9.0, 0.0, 0.0], atol=1e-4)
        np.testing.assert_allclose(got[4][:3, 3], [11.0, 0.0, 0.0], atol=1e-4)
        # untouched rows unchanged
        np.testing.assert_allclose(got[0], poses[0], atol=1e-6)
        np.testing.assert_allclose(got[3], poses[3], atol=1e-6)
        # current-frame pose = last cams row
        np.testing.assert_allclose(
            np.asarray(new_cur)[:3, 3], [12.0, 0.0, 0.0], atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(new_cur)[3], [0, 0, 0, 1])


class TestStoreDeviceTruth:
    def test_append_preserves_device_updates_and_sync(self):
        poses = [_pose([0.1 * i, 0.0, 1.0]) for i in range(3)]
        store = _store(poses)
        _, _, kf_poses = store.device_stack()
        updated = kf_poses.at[1, 0, 3].set(5.0)
        store.set_poses_device(updated)
        assert store.host_poses_stale
        # stale host row untouched until sync
        assert store.frames[1]["est_c2w"][0, 3] != 5.0
        # append a 4th keyframe: device truth for rows 0..2 must survive
        store.append(3, store.frames[0]["color"], store.frames[0]["depth"],
                     store.frames[0]["event"], _pose([9, 9, 9]),
                     _pose([9, 9, 9]))
        cols, deps, stacked = store.device_stack()
        assert cols.shape[0] == 4
        got = np.asarray(stacked)
        assert got[1, 0, 3] == 5.0
        np.testing.assert_allclose(got[3][:3, 3], [9, 9, 9])
        store.sync_host_poses()
        assert not store.host_poses_stale
        assert store.frames[1]["est_c2w"][0, 3] == 5.0

    def test_set_pose_after_sync_rebuilds_from_host(self):
        poses = [_pose([0.1 * i, 0.0, 1.0]) for i in range(2)]
        store = _store(poses)
        _, _, kf_poses = store.device_stack()
        store.set_poses_device(kf_poses.at[0, 1, 3].set(7.0))
        store.sync_host_poses()
        store.set_pose(0, _pose([3, 3, 3]))
        _, _, stacked = store.device_stack()
        np.testing.assert_allclose(np.asarray(stacked)[0][:3, 3], [3, 3, 3])

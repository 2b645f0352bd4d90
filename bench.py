"""Benchmark: combined tracked+mapped FPS on a Replica-room0-shaped workload.

Runs the full EvenNICER-SLAM pipeline (event tracking at 0.15 scale each
iteration, RGB-D loss every 5th frame, mapping every 5 frames, coarse mapper
on) at the reference's Replica resolution and iteration counts
(reference configs/nice_slam.yaml:38-70, configs/Replica/replica.yaml:16-36),
on procedurally generated data, and reports steady-state frames/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 10 combined tracked+mapped FPS (BASELINE.md north star).
"""

import json
import os
import sys
import time


def main():
    from evennicer_slam_tpu.utils.runtime import setup_jax

    setup_jax()

    import jax
    import numpy as np

    from evennicer_slam_tpu.config import default_config_path, load_config, update_recursive
    from evennicer_slam_tpu.data.synthetic import make_synthetic_replica
    from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM

    # 90 measured frames = 3 super-blocks of 30 (headline, pinned K=2 window)
    # + 10 grown-window warm frames + 90 grown-window measured frames (3
    # super-blocks of 30 at K=5, device-side overlap selection + BA live —
    # the registry-grown workload a real Replica run reaches past frame 50;
    # see the second phase below). n_frames stays 2 past the last preloaded
    # frame so the reader's decode-ahead never fires from inside a measured
    # block. (The n_img-2 keyframe add and the n_img-1 color refine never
    # run here.)
    n_frames = 198
    warm_frames = 6  # frames 0..5 include first-map + all compiles
    scene_dir = os.environ.get("ENSLAM_BENCH_SCENE", "/tmp/enslam_bench_scene")
    frag = make_synthetic_replica(
        scene_dir, n_frames=n_frames, H=680, W=1200, fx=600.0, fy=600.0,
        bound=np.array([[-2.0, 2.0], [-1.6, 1.6], [-1.2, 1.2]], np.float32),
        traj_step=0.01,
        # skip minutes of host ray tracing on reruns; the reuse check
        # re-renders frame 0 and invalidates on any scene-content change
        reuse_if_current=True,
    )

    cfg = load_config(default_config_path(nice=True))
    update_recursive(cfg, frag)
    update_recursive(cfg, {
        "verbose": False,
        # the per-iteration visualizer would fire at idx 50/100 (vis_freq)
        # INSIDE the measured window: a full-image render + pose fetch
        "enable_vis": False,
        # no metric fetch may land inside the measured window (the host link
        # has minute-scale throughput weather; bench.py flushes manually)
        "metrics_flush_batch": 10**9,
        # Replica event workload shape (reference configs/Replica/replica.yaml)
        "event": {
            # throughput bench: EventNet weights do not affect timing, so the
            # net runs from random init unless a trained .npz is present
            # (produce one with tools/event_ablation.py or
            # tools/train_eventnet.py)
            "pretrained_path": "pretrained/eventnet_mapdomain.npz",
            "rgbd_every_frame": 5, "activate_events": True, "balancer": 0.025,
            "scale_factor": 0.15, "blur": True, "kernel_sizes": [9],
            "unblurred_weight": 0, "kernel_weights": [1],
        },
        "tracking": {"ignore_edge_W": 100, "ignore_edge_H": 100},
        # first-frame init runs in the (unmeasured) warmup; trim it so a
        # cold-cache bench stays inside driver time limits. keyframe_every
        # is pinned past the window: every bench since r01 measures the
        # 2-frame mapping window (kf0 + current; the reference's registry
        # would add its first extra keyframe at frame 50, where the window
        # length K — a traced shape — changes and recompiles); pinning it
        # keeps the measured math identical while the window extends past
        # frame 50
        "mapping": {"mesh_freq": 10**9, "ckpt_freq": 10**9,
                    "iters_first": 300, "keyframe_every": 10**9},
        "data": {"output": os.path.join(scene_dir, "output")},
    })

    slam = EvenNICERSLAM(cfg, nice=True)
    assert slam.use_events, "bench must exercise the event pipeline"

    # warmup: first-map (1500 iters) + all executable compiles (tracker
    # event/rgbd variants at frames 1..5, steady-state mapping at frame 5)
    for idx in range(warm_frames):
        slam.step(idx)

    # measured window: steady-state frames only (keyframe growth pinned off
    # above; the final-frame color refine is past the window).
    #
    # Weather-proofing: the host<->device link has minute-scale throughput
    # weather (same commit benched 1.9 and 0.86 fps hours apart when per-frame
    # uploads sat inside the timed region). So (1) ALL measured-window frames
    # are decoded + uploaded to HBM before timing starts, (2) metric fetches
    # are deferred past the window, and (3) the steady-state pipeline is
    # fully asynchronous — mapping takes the tracker's device pose directly
    # (pipeline._map_frame fast path), so the whole super-block enqueues
    # without the host ever draining the queue and link stalls cannot idle
    # the chip. (The pipeline's in-flight pacing fetches the output of the
    # mapping call max_inflight_maps=4 calls back — it holds the HOST to a
    # bounded run-ahead but never empties the device queue.) The only full
    # syncs are the 3 super-block boundaries: a 1-element fetch from the
    # freshly-mapped grids drains every enqueued program, so each
    # super-block is exactly 30 tracked frames + 6 mapping calls of device
    # work. Median of the 3 rates + spread make any residual transient
    # visible instead of silently flipping the headline.
    every = slam.m_cfg.every_frame
    n_super = 3
    sync_every = 6 * every  # 30 frames per super-block
    end = warm_frames + n_super * sync_every
    assert end <= n_frames - 2
    # preload THROUGH frame `end`: the reader decode-aheads idx+1 on every
    # read, so frame `end` must already be cached or its decode+upload lands
    # inside the last measured block
    slam.frame_reader.preload_device(range(warm_frames, end + 1))
    slam._flush_metrics(force=True)

    def drain():
        # the grids leaf is produced by the LAST enqueued program (the
        # boundary mapping call); fetching one element of it waits for
        # everything, pose included
        np.asarray(jax.device_get(jax.tree.leaves(slam.grids)[0][0, 0, 0, :1]))

    drain()
    block_rates = []
    t0 = time.perf_counter()
    for idx in range(warm_frames, end):
        slam.step(idx)
        if (idx - warm_frames + 1) % sync_every == 0:
            drain()
            t1 = time.perf_counter()
            block_rates.append(sync_every / (t1 - t0))
            t0 = t1
    fps = float(np.median(block_rates))
    spread = float((np.max(block_rates) - np.min(block_rates)) / fps)

    # ---- grown-window phase (round-3 verdict item 4; round-5: same 3-super-
    # block statistical treatment as the headline) --------------------------
    # A real Replica run grows the registry to mapping_window_size keyframes
    # (reference src/Mapper.py:287-317): K=5 window assembly with DEVICE-side
    # overlap selection + assembly + BA write-back (keyframes.py
    # select_assemble_window_dev / scatter_window_poses_dev on the async fast
    # path — no host pose fetch per mapping call), and BA (nice_slam.yaml
    # BA: true, active at >4 keyframes). Pre-grow the registry OUTSIDE the
    # timed region so K stays static (no recompile in-window), warm the
    # K=5/BA executables over 10 frames, then measure 3 super-blocks of 30
    # and report their median + spread like the headline.
    for kf_idx in (20, 40, 60, 80):
        f = slam.frame_reader[kf_idx]
        slam.mapper.keyframes.append(
            kf_idx, f.color, f.depth, np.asarray(f.event),
            slam._pose_np(kf_idx).copy(), f.c2w,
        )
    slam.mapper.update_ba_state()
    assert len(slam.mapper.keyframes) == 5
    grow_warm_end = end + 2 * every  # 2 mapping calls compile K=5 (+BA)
    grown_end = grow_warm_end + n_super * sync_every
    assert grown_end <= n_frames - 2
    # headline-phase frames are consumed: release their pinned device copies
    # before pinning the grown phase's window (HBM headroom)
    slam.frame_reader.release_device(range(warm_frames, end - 1))
    slam.frame_reader.preload_device(range(end, grown_end + 1))
    for idx in range(end, grow_warm_end):
        slam.step(idx)
    slam._flush_metrics(force=True)
    drain()
    grown_rates = []
    t0 = time.perf_counter()
    for idx in range(grow_warm_end, grown_end):
        slam.step(idx)
        if (idx - grow_warm_end + 1) % sync_every == 0:
            drain()
            t1 = time.perf_counter()
            grown_rates.append(sync_every / (t1 - t0))
            t0 = t1
    grown_fps = float(np.median(grown_rates))
    grown_spread = float(
        (np.max(grown_rates) - np.min(grown_rates)) / grown_fps
    )
    assert slam.mapper.BA_active, "grown-window phase must exercise BA"
    assert slam.n_fast_maps >= (grown_end - end) // every, (
        "grown-window mapping left the async device fast path"
    )

    out = {
        "metric": "combined_tracked_mapped_fps_replica_room0_shape",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "block_rates": [round(r, 3) for r in block_rates],
        "block_spread_frac": round(spread, 5),
        # registry grown to mapping_window_size: K=5 window, device-side
        # overlap selection/assembly/BA write-back on the async fast path,
        # BA active — the workload shape a real Replica run reaches once 5
        # keyframes exist; median of 3 super-blocks + spread like the
        # headline
        "grown_window_fps": round(grown_fps, 3),
        "grown_window_rates": [round(r, 3) for r in grown_rates],
        "grown_window_spread_frac": round(grown_spread, 5),
        "grown_window_delta_frac": round(grown_fps / fps - 1.0, 4),
        # the BASELINE.md target (>= 10 fps) is specified at TPU v5e-8; this
        # machine exposes ONE chip, so value/vs_baseline are dp=1 numbers
        "note": "target hw is v5e-8; bench machine exposes 1 chip (dp=1)",
    }
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "dp_projection.json")) as f:
            proj = json.load(f)
        # best 8-chip configuration: strict dp=8 or a loose overlap split
        cands = [
            (p["fps"], f"strict dp={p['dp']}")
            for p in proj.get("projections", []) if p.get("dp") == 8
        ] + [
            (p["fps"], f"loose {p['split']}")
            for p in proj.get("overlap_projections", [])
        ]
        if cands:
            best = max(cands)
            out["projected_v5e8_fps"] = best[0]
            out["projected_v5e8_config"] = best[1]
    except (OSError, ValueError, KeyError):
        pass
    print(json.dumps(out))
    sys.stdout.flush()
    # the remote-platform client can abort() in C++ teardown after a long
    # run ("terminate called without an active exception"), which would turn
    # a successful bench into a nonzero exit; the JSON line is out, stop here
    os._exit(0)


if __name__ == "__main__":
    main()

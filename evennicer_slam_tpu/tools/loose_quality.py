"""Quality cost of the loose headline config's mapping cadence.

The v5e-8 headline configuration (ARCHITECTURE.md, loose track=6/map=2) is
mapper-bound at an effective mapping cadence of ~7 frames versus strict's
every-5 — ~29% fewer map updates. This tool measures what that trade costs in
trajectory quality on the synthetic validation scene, isolating the cadence
effect two ways:

- ``strict5``  : the reference default schedule (every_frame = 5),
- ``strict7``  : identical except every_frame = 7 — the loose headline's
                 mapper-bound cadence, applied deterministically,
- ``loose``    : the actual concurrent loose schedule on a 2-device map group
                 (CPU mesh; cadence emerges from completion gating, so it is
                 timing-dependent like the reference's own loose mode,
                 /root/reference/src/Mapper.py:752-757).

Each config runs ``--seeds`` different scene-state initializations; ATE RMSE
mean +/- std per config goes to ``--out`` (benchmarks/loose_quality.json).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -m evennicer_slam_tpu.tools.loose_quality [--frames 40]
"""

from __future__ import annotations

import argparse
import json
import os


def build_cfg(scene_dir: str, frames: int, seed: int):
    from evennicer_slam_tpu.config import (
        default_config_path,
        load_config,
        update_recursive,
    )
    from evennicer_slam_tpu.data.synthetic import make_synthetic_replica

    frag = make_synthetic_replica(
        scene_dir, n_frames=frames, H=64, W=80, fx=60.0, fy=60.0,
        traj_step=0.02, reuse_if_current=True,
    )
    frag["dataset"] = "replica"  # RGB-D mode: the headline workload
    cfg = load_config(default_config_path(nice=True))
    update_recursive(cfg, frag)
    update_recursive(cfg, {
        "verbose": False,
        "coarse": True,
        "seed": seed,
        "enable_vis": False,
        "mapping": {
            "iters_first": 300, "iters": 60, "every_frame": 5,
            "pixels": 500, "mapping_window_size": 5, "keyframe_every": 5,
            "mesh_freq": 10**9, "ckpt_freq": 10**9, "color_refine": False,
            "keyframe_catchup": True,
        },
        "tracking": {"iters": 10, "pixels": 200,
                     "ignore_edge_W": 4, "ignore_edge_H": 4},
        "grid_len": {"coarse": 0.8, "middle": 0.4, "fine": 0.2, "color": 0.2,
                     "bound_divisible": 0.2},
        "meshing": {"eval_rec": False},
        "data": {"output": os.path.join(scene_dir, "out_lq")},
    })
    return cfg


def run_one(cfg):
    import numpy as np

    from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM
    from evennicer_slam_tpu.tools.eval_ate import evaluate_ate

    slam = EvenNICERSLAM(cfg, nice=True)
    est = slam.run(mesh=False, checkpoint=False)
    n = slam.n_img
    res = evaluate_ate(
        np.asarray(est)[:n, :3, 3], np.asarray(slam.gt_c2w_list)[:n, :3, 3]
    )
    return float(res["absolute_translational_error.rmse"]), slam


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--scene", default="/tmp/enslam_loose_quality")
    ap.add_argument("--out", default="benchmarks/loose_quality.json")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    args = ap.parse_args()

    # force the 8-virtual-device CPU platform BEFORE any backend touch —
    # the loose config needs >= 3 devices for its track/map split, and the
    # ambient platform may be a single remote chip (env-var overrides do not
    # survive the interpreter-start jax import; same incantation as
    # __graft_entry__.dryrun_multichip)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 3, "virtual CPU platform did not activate"

    import copy

    import numpy as np

    results = {"frames": args.frames, "configs": {}}
    for name in ("strict5", "strict7", "loose"):
        rows = []
        for seed in args.seeds:
            cfg = build_cfg(args.scene, args.frames, seed)
            if name == "strict7":
                cfg["mapping"]["every_frame"] = 7
            elif name == "loose":
                cfg = copy.deepcopy(cfg)
                cfg["sync_method"] = "loose"
                cfg["parallel"] = dict(cfg.get("parallel", {}),
                                       map_devices=2, data_parallel=1)
            rmse, slam = run_one(cfg)
            row = {"seed": seed, "ate_rmse_m": rmse}
            if name == "loose":
                row["concurrent"] = bool(slam.concurrent)
                row["n_maps"] = int(slam.n_concurrent_maps)
                row["n_frames"] = int(slam.n_img)
            rows.append(row)
            print(f"[{name} seed {seed}] ATE RMSE {rmse:.4f} m", flush=True)
        vals = [r["ate_rmse_m"] for r in rows]
        results["configs"][name] = {
            "runs": rows,
            "ate_rmse_mean_m": float(np.mean(vals)),
            "ate_rmse_std_m": float(np.std(vals)),
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

"""Event-branch ablation: does event tracking beat dead reckoning?

The system's namesake capability is tracking frames that have NO RGB-D
(``rgbd_every_frame=5``, reference configs/Replica/replica.yaml:5) using the
EventNet loss. This tool quantifies it on the synthetic benchmark:

  A. dead reckoning      — event loss computed but NOT optimized
                           (activate_events=false); non-RGB-D frames keep the
                           constant-speed extrapolation; best pose by RGB-D.
  B. events (GT-trained) — net trained on GT-GT intensity pairs (the round-1
                           setup that LOST to dead reckoning).
  C. events (map-domain) — net fine-tuned on (map-render, GT-event) pairs
                           (models/eventnet_train.map_domain_pairs), the
                           tracker's true inference distribution.

Each run reports ATE RMSE vs ground truth. Also prints the
best-pose-criterion quirk ablation (reference src/Tracker.py:439-442):
variant C with selection by event loss (reference behavior) vs RGB-D loss.

Usage:
    python -m evennicer_slam_tpu.tools.event_ablation \
        [--frames 26] [--hw 240 320] [--out pretrained/eventnet_mapdomain.npz]
"""

from __future__ import annotations

import argparse
import copy
import json
import os


def build_cfg(scene_dir: str, n_frames: int, H: int, W: int,
              traj_jitter: float = 0.004):
    import numpy as np

    from evennicer_slam_tpu.config import (
        default_config_path,
        load_config,
        update_recursive,
    )
    from evennicer_slam_tpu.data.synthetic import make_synthetic_replica

    # traj_jitter adds per-frame pose noise: real camera motion has jerk,
    # and without it constant-speed dead reckoning is a near-perfect oracle
    # on the synthetic orbit (measured: ATE 0.054 m vs 0.072 m for events at
    # jitter 0) - the event branch exists precisely for the frames where
    # extrapolation fails
    frag = make_synthetic_replica(
        scene_dir, n_frames=n_frames, H=H, W=W, fx=0.5 * W, fy=0.5 * W,
        bound=np.array([[-2.0, 2.0], [-1.6, 1.6], [-1.2, 1.2]], np.float32),
        traj_step=0.015, traj_jitter=traj_jitter,
    )
    cfg = load_config(default_config_path(nice=True))
    update_recursive(cfg, frag)
    update_recursive(cfg, {
        "verbose": False,
        "enable_vis": False,
        "event": {
            "pretrained_path": "/nonexistent",
            "rgbd_every_frame": 5, "activate_events": True, "balancer": 0.025,
            "scale_factor": 0.15, "blur": True, "kernel_sizes": [9],
            "unblurred_weight": 0, "kernel_weights": [1],
        },
        "tracking": {"ignore_edge_W": 20, "ignore_edge_H": 20},
        # keep the reference's FULL 1500-iteration first-frame schedule: the
        # event branch renders the current view from the map, and a
        # half-built first map poisons every early event loss (measured: the
        # event-loss landscape around the true pose is a clean ~±5 mm basin
        # on a converged map)
        "mapping": {"mesh_freq": 10**9, "ckpt_freq": 10**9},
        "data": {"output": os.path.join(scene_dir, "out")},
    })
    return cfg


def run_variant(cfg, eventnet, n_frames: int, activate: bool, criterion: str):
    import numpy as np

    from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM
    from evennicer_slam_tpu.tools.eval_ate import evaluate_ate

    cfg = copy.deepcopy(cfg)
    cfg["event"]["activate_events"] = activate
    cfg["event"]["best_pose_criterion"] = criterion
    slam = EvenNICERSLAM(cfg, nice=True)
    if eventnet is not None:
        slam.eventnet = eventnet
        slam.tracker.eventnet = eventnet
    assert slam.use_events
    slam.run(end_frame=n_frames, mesh=False, checkpoint=False)
    est = slam.estimate_c2w_list[:n_frames]
    gt = slam.gt_c2w_list[:n_frames]
    res = evaluate_ate(est[:, :3, 3], gt[:, :3, 3])
    return float(res["absolute_translational_error.rmse"])


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--frames", type=int, default=26)
    parser.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    parser.add_argument("--scene", default="/tmp/enslam_event_ablation")
    parser.add_argument("--out", default="pretrained/eventnet_mapdomain.npz")
    parser.add_argument("--train_steps", type=int, default=300)
    parser.add_argument("--traj_jitter", type=float, default=0.004)
    parser.add_argument("--skip_gt_variant", action="store_true")
    parser.add_argument("--net", default=None,
                        help="load this .npz and skip all training")
    args = parser.parse_args()

    from evennicer_slam_tpu.utils.runtime import setup_jax

    setup_jax()

    import numpy as np

    from evennicer_slam_tpu.models.eventnet_train import (
        save_eventnet_npz,
        train_eventnet,
        train_eventnet_map_domain,
    )

    H, W = args.hw
    cfg = build_cfg(args.scene, args.frames, H, W,
                    traj_jitter=args.traj_jitter)
    results = {}

    results["dead_reckoning"] = run_variant(
        cfg, None, args.frames, activate=False, criterion="rgbd"
    )
    print(json.dumps({"variant": "A dead reckoning",
                      "ate_rmse_m": results["dead_reckoning"]}), flush=True)

    if args.net:
        from evennicer_slam_tpu.models.eventnet_train import load_eventnet_npz

        net_md = load_eventnet_npz(args.net)
        _report_event_variants(cfg, net_md, args, results)
        return

    bound = np.array(cfg["mapping"]["bound"], np.float32)
    if not args.skip_gt_variant:
        net_gt = train_eventnet(steps=args.train_steps, batch=4,
                                hw=(int(H * 0.15), int(W * 0.15)),
                                bound=bound, seed=0, verbose=True)
        results["events_gt_trained"] = run_variant(
            cfg, net_gt, args.frames, activate=True, criterion="event"
        )
        print(json.dumps({"variant": "B events (GT-GT trained)",
                          "ate_rmse_m": results["events_gt_trained"]}),
              flush=True)
        init = net_gt
    else:
        # skip the (host-render-bound) GT-GT stage entirely; map-domain
        # training below starts from scratch with more steps
        init = None

    # GT renders at arbitrary poses (synthetic scene) enable perturbed-pose
    # triples: they teach the net to report the events implied by what an
    # OFF-pose render shows, which is what gives the tracker's event loss a
    # usable pose gradient
    from evennicer_slam_tpu.data.synthetic import render_box_views

    bound_arr = np.array([[-2.0, 2.0], [-1.6, 1.6], [-1.2, 1.2]], np.float32)
    cam = cfg["cam"]

    def gt_render_fn(c2w):
        return render_box_views(
            c2w, cam["H"], cam["W"], cam["fx"], cam["fy"], cam["cx"],
            cam["cy"], bound_arr,
        )

    net_md = train_eventnet_map_domain(
        cfg, steps=args.train_steps if init is not None else 2 * args.train_steps,
        n_map_frames=args.frames, n_pairs=128,
        init_params=init, seed=0,
        perturb_trans=0.01, perturb_rot=0.005, gt_render_fn=gt_render_fn,
        verbose=True,
    )
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        save_eventnet_npz(net_md, args.out)

    _report_event_variants(cfg, net_md, args, results)


def _report_event_variants(cfg, net_md, args, results):
    import json as _json

    results["events_map_domain"] = run_variant(
        cfg, net_md, args.frames, activate=True, criterion="event"
    )
    print(_json.dumps({"variant": "C events (map-domain)",
                       "ate_rmse_m": results["events_map_domain"]}), flush=True)

    results["events_map_domain_rgbd_criterion"] = run_variant(
        cfg, net_md, args.frames, activate=True, criterion="rgbd"
    )
    print(_json.dumps({
        "variant": "C' map-domain, best pose by RGB-D (quirk ablation)",
        "ate_rmse_m": results["events_map_domain_rgbd_criterion"],
    }), flush=True)

    # D: events optimized ONLY where there is no RGB-D loss — the event
    # signal's ~5 mm bias otherwise degrades the mm-precise anchor frames
    # (framework extension; reference always sums both)
    results["events_non_rgbd_only"] = run_variant(
        cfg, net_md, args.frames, activate="non_rgbd", criterion="rgbd"
    )
    print(_json.dumps({
        "variant": "D events on non-RGB-D frames only (extension)",
        "ate_rmse_m": results["events_non_rgbd_only"],
    }), flush=True)

    dr = results.get("dead_reckoning", float("inf"))
    best_ev = min(results["events_map_domain"],
                  results["events_non_rgbd_only"],
                  results["events_map_domain_rgbd_criterion"])
    print(_json.dumps({
        "summary": results,
        # reference behavior (variant C) vs any mode incl. the extensions
        "events_beat_dead_reckoning_reference":
            bool(results["events_map_domain"] < dr),
        "events_beat_dead_reckoning_any_mode": bool(best_ev < dr),
    }), flush=True)


if __name__ == "__main__":
    main()

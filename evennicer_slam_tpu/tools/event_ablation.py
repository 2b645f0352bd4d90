"""Event-branch ablation: does event tracking beat dead reckoning?

The system's namesake capability is tracking frames that have NO RGB-D
(``rgbd_every_frame=5``, reference configs/Replica/replica.yaml:5) using the
EventNet loss. This tool quantifies it on the synthetic benchmark across a
variant grid (ATE RMSE vs ground truth, optionally over multiple trajectory
seeds with mean +- std):

  A  dead reckoning       — event loss computed but NOT optimized; non-RGB-D
                            frames keep constant-speed extrapolation.
  B  events (GT-trained)  — net trained on GT-GT intensity pairs (round-1
                            setup; needs --with_gt_variant).
  C  events (map-domain)  — reference behavior: net fine-tuned on
                            (map-render, GT-event) pairs, best pose by the
                            event loss (quirk, reference src/Tracker.py:439).
  C' C with best pose by RGB-D on RGB-D frames (quirk ablation).
  D  events optimized only on non-RGB-D frames (extension knob).
  E  D + event-bias self-calibration (event.bias_correction: the basin's
     systematic offset is measured at RGB-D-anchored frames and subtracted
     from event-tracked poses; see slam/tracker.py).
  E' E with window-scaled bias (event.bias_scale_mode: window).
  F  C + bias calibration (reference activation + correction).

Usage:
    python -m evennicer_slam_tpu.tools.event_ablation \
        [--frames 26] [--hw 240 320] [--seeds 3] \
        [--out pretrained/eventnet_mapdomain.npz] [--net <trained.npz>]
"""

from __future__ import annotations

import argparse
import copy
import json
import os


def build_cfg(scene_dir: str, n_frames: int, H: int, W: int,
              traj_jitter: float = 0.004, traj_seed: int = 7,
              keyframe_every: int = None, traj_step: float = 0.015):
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
        traj_step=traj_step, traj_jitter=traj_jitter, traj_seed=traj_seed,
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
    if keyframe_every is not None:
        # sequences much longer than the 26-frame screen sweep more of the
        # orbit than keyframe_every=50 was tuned for; denser keyframes keep
        # the overlap selector anchored so the ablation measures the EVENT
        # branch, not anchor starvation (measured: 100 frames at the
        # reference cadence drift to 0.23 m ATE for every variant)
        cfg["mapping"]["keyframe_every"] = keyframe_every
    return cfg


# variant grid: name -> (activate_events, best_pose_criterion, extra event cfg)
VARIANTS = {
    "A_dead_reckoning": (False, "rgbd", {}),
    # FULL-RGBD ANCHOR (round-3 verdict item 3): RGB-D loss on EVERY frame,
    # no event optimization — what the tracker achieves when it never has to
    # coast between anchors. The event rows give up (R - C) of ATE in
    # exchange for needing RGB-D only every 5th frame.
    "R_full_rgbd_anchor": (False, "rgbd", {"rgbd_every_frame": 1}),
    "C_events_reference": (True, "event", {}),
    # ORACLE: analytic ESIM predictor instead of the UNet. On the synthetic
    # bench the GT events ARE gain*(I2-I1) split by polarity, so this is the
    # Bayes-optimal predictor — the ceiling any trained net could reach.
    # C vs O separates "net quality" from "loss/feedback geometry" as the
    # binding constraint on event-tracking ATE.
    "O_esim_oracle": (True, "event", {"predictor": "esim"}),
    # GAP ATTACK (round-3 verdict item 3): the oracle row shows the
    # predictor is not the binding constraint — the 0.15-scale event render
    # is. Supervise the event loss at a higher resolution (0.25 scale =
    # 2.8x the pixels; costs proportional render time per tracking iter).
    # Run with the esim predictor so the measurement isolates resolution
    # from UNet domain-shift (the shipped UNet was trained at 0.15 scale).
    "H_hires_events": (True, "event",
                       {"scale_factor": 0.25, "predictor": "esim"}),
    # as H, but with the event weight normalized PER PIXEL: the reference's
    # balancer multiplies a summed loss, so 2.8x the pixels silently means
    # 2.8x the event weight against the RGB-D anchor terms;
    # 0.025 * (0.15/0.25)^2 = 0.009 keeps the per-pixel weight constant
    "H2_hires_balanced": (True, "event",
                          {"scale_factor": 0.25, "predictor": "esim",
                           "balancer": 0.009}),
    # DEPLOYABLE H2 (round-4 verdict item 4): the H2 recipe with the UNet
    # instead of the analytic predictor. Requires a net TRAINED at 0.25
    # scale (--train_scale 0.25, or --net <0.25-trained.npz>); the shipped
    # 0.15-scale net is out-of-domain at 0.25 and diverges (documented in
    # configs/Replica/replica_hires_events.yaml).
    "H2u_hires_unet": (True, "event",
                       {"scale_factor": 0.25, "balancer": 0.009}),
    "Cp_rgbd_criterion": (True, "rgbd", {}),
    "D_non_rgbd_only": ("non_rgbd", "rgbd", {}),
    "E_bias_const": ("non_rgbd", "rgbd", {"bias_correction": True}),
    "Ep_bias_window": ("non_rgbd", "rgbd",
                       {"bias_correction": True, "bias_scale_mode": "window"}),
    "F_reference_plus_bias": (True, "event", {"bias_correction": True}),
    # EMA-damped bias: average the probe across boundaries (cancels the
    # probe's Adam-transient noise), apply at half strength, window-scaled
    "E2_bias_ema_damped": ("non_rgbd", "rgbd",
                           {"bias_correction": True, "bias_ema": 0.7,
                            "bias_alpha": 0.5,
                            "bias_scale_mode": "window"}),
}


def summarize(per_seed, seeds, frames):
    """Per-variant mean/std plus events-vs-dead-reckoning flags. Comparison
    flags are emitted only when both sides were actually measured (a
    --variants subset must not claim a comparison that never ran)."""
    import numpy as np

    summary = {
        name: {
            "mean": float(np.mean(v)),
            "std": float(np.std(v)),
            "runs": [round(x, 5) for x in v],
        }
        for name, v in per_seed.items()
    }
    # deployable event modes only: the O_* oracle is a BOUND (Bayes-optimal
    # on synthetic ESIM GT by construction) and R_* is the full-RGBD anchor
    # (not an event mode) — neither may set best_event_mode or the
    # beats-dead-reckoning flags
    ev_means = {n: s["mean"] for n, s in summary.items()
                if not n.startswith(("A_", "O_", "R_"))}
    best = min(ev_means, key=ev_means.get) if ev_means else None
    out = {
        "summary": summary,
        "seeds": seeds,
        "frames": frames,
        "best_event_mode": best,
    }
    oracle = [n for n in summary if n.startswith("O_")]
    if oracle:
        out["oracle_bound_mean"] = {n: summary[n]["mean"] for n in oracle}
    if "A_dead_reckoning" in summary:
        dr = summary["A_dead_reckoning"]["mean"]
        if "C_events_reference" in summary:
            out["events_beat_dead_reckoning_reference"] = bool(
                summary["C_events_reference"]["mean"] < dr)
        if best is not None:
            out["events_beat_dead_reckoning_any_mode"] = bool(
                ev_means[best] < dr)
    return out


def run_variant(cfg, eventnet, n_frames: int, activate, criterion: str,
                extra_event_cfg=None):
    import numpy as np

    from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM
    from evennicer_slam_tpu.tools.eval_ate import evaluate_ate

    cfg = copy.deepcopy(cfg)
    cfg["event"]["activate_events"] = activate
    cfg["event"]["best_pose_criterion"] = criterion
    for k, v in (extra_event_cfg or {}).items():
        cfg["event"][k] = v
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
    # default OFF-tree: committed weights are a one-time artifact
    # (pretrained/README.md) — retrains must not churn the 46 MB blob
    parser.add_argument("--out", default="/tmp/eventnet_mapdomain.npz")
    parser.add_argument("--train_steps", type=int, default=300)
    parser.add_argument("--traj_jitter", type=float, default=0.004)
    parser.add_argument("--seeds", type=int, default=1,
                        help="number of trajectory-jitter seeds (mean+-std)")
    parser.add_argument("--with_gt_variant", action="store_true",
                        help="also train+run the round-1 GT-GT variant (B)")
    parser.add_argument("--skip_gt_variant", action="store_true",
                        help="(default; kept for CLI compatibility)")
    parser.add_argument("--variants", nargs="*", default=None,
                        help=f"subset of {list(VARIANTS)} (default: all)")
    parser.add_argument("--net", default=None,
                        help="load this .npz and skip all training")
    parser.add_argument("--keyframe_every", type=int, default=None)
    parser.add_argument("--train_scale", type=float, default=None,
                        help="override event.scale_factor for NET TRAINING"
                             " only (e.g. 0.25 to train the deployable H2"
                             " net; the variant grid still sets its own"
                             " inference-time scale_factor)")
    parser.add_argument("--traj_step", type=float, default=0.015,
                        help="orbit angle per frame. For sequences longer"
                             " than the 26-frame screen, scale it down"
                             " (0.015*26/frames) so the total sweep - and"
                             " hence the keyframe-anchoring load - matches"
                             " the validated workload; the per-frame jitter"
                             " (what events correct) is unchanged")
    args = parser.parse_args()

    unknown = [n for n in (args.variants or []) if n not in VARIANTS]
    if unknown:
        parser.error(f"unknown --variants {unknown}; choose from {list(VARIANTS)}")

    from evennicer_slam_tpu.utils.runtime import setup_jax

    setup_jax()

    import numpy as np

    from evennicer_slam_tpu.models.eventnet_train import (
        save_eventnet_npz,
        train_eventnet,
        train_eventnet_map_domain,
    )

    H, W = args.hw
    seeds = [7 + 1000 * i for i in range(max(1, args.seeds))]
    cfg0 = build_cfg(args.scene, args.frames, H, W,
                     traj_jitter=args.traj_jitter, traj_seed=seeds[0],
                     keyframe_every=args.keyframe_every,
                     traj_step=args.traj_step)

    names = args.variants or list(VARIANTS)
    # A_* (dead reckoning) never runs the net; O_* uses the analytic esim
    # predictor — training minutes of map-domain EventNet for those alone
    # would be pure waste
    needs_net = any(not n.startswith(("A_", "O_")) for n in names)

    # --- net: load or train once (on the first seed's scene) -------------
    net_md = None
    if not needs_net:
        pass
    elif args.net:
        from evennicer_slam_tpu.models.eventnet_train import load_eventnet_npz

        net_md = load_eventnet_npz(args.net)
    else:
        bound = np.array(cfg0["mapping"]["bound"], np.float32)
        init = None
        if args.with_gt_variant:
            net_gt = train_eventnet(steps=args.train_steps, batch=4,
                                    hw=(int(H * 0.15), int(W * 0.15)),
                                    bound=bound, seed=0, verbose=True)
            ate_b = run_variant(cfg0, net_gt, args.frames, True, "event")
            print(json.dumps({"variant": "B events (GT-GT trained)",
                              "ate_rmse_m": ate_b}), flush=True)
            init = net_gt

        # GT renders at arbitrary poses (synthetic scene) enable
        # perturbed-pose triples: they teach the net to report the events
        # implied by what an OFF-pose render shows, which is what gives the
        # tracker's event loss a usable pose gradient
        from evennicer_slam_tpu.data.synthetic import render_box_views

        bound_arr = np.array([[-2.0, 2.0], [-1.6, 1.6], [-1.2, 1.2]],
                             np.float32)
        cam = cfg0["cam"]

        def gt_render_fn(c2w):
            return render_box_views(
                c2w, cam["H"], cam["W"], cam["fx"], cam["fy"], cam["cx"],
                cam["cy"], bound_arr,
            )

        cfg_train = cfg0
        if args.train_scale is not None:
            # train at the deployment scale (map_domain_pairs reads
            # event.scale_factor for its lo_hw): the H2 recipe runs the net
            # at 0.25, and a 0.15-trained net is out-of-domain there
            cfg_train = copy.deepcopy(cfg0)
            cfg_train["event"]["scale_factor"] = args.train_scale
        net_md = train_eventnet_map_domain(
            cfg_train,
            steps=args.train_steps if init is not None else 2 * args.train_steps,
            n_map_frames=args.frames, n_pairs=128,
            init_params=init, seed=0,
            perturb_trans=0.01, perturb_rot=0.005, gt_render_fn=gt_render_fn,
            verbose=True,
        )
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            save_eventnet_npz(net_md, args.out)

    # --- variant grid x seeds -------------------------------------------
    per_seed = {name: [] for name in names}
    for seed in seeds:
        cfg = (cfg0 if seed == seeds[0] else build_cfg(
            args.scene + f"_s{seed}", args.frames, H, W,
            traj_jitter=args.traj_jitter, traj_seed=seed,
            keyframe_every=args.keyframe_every, traj_step=args.traj_step,
        ))
        for name in names:
            activate, criterion, extra = VARIANTS[name]
            net = None if name.startswith(("A_", "O_")) else net_md
            ate = run_variant(cfg, net, args.frames, activate, criterion,
                              extra)
            per_seed[name].append(ate)
            print(json.dumps({"variant": name, "seed": seed,
                              "ate_rmse_m": round(ate, 5)}), flush=True)

    print(json.dumps(summarize(per_seed, seeds, args.frames)), flush=True)


if __name__ == "__main__":
    main()

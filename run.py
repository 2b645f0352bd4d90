"""EvenNICER-SLAM-TPU command line (API-compatible with the reference run.py).

    python run.py configs/Replica/room0.yaml [--input_folder F] \
        [--event_folder E] [--output O] [--nice | --imap] [--resume]

The --resume flag (new capability, absent in the reference) restarts from the
latest checkpoint in the output directory.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(
        description="Arguments for running EvenNICER-SLAM-TPU."
    )
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--input_folder", type=str,
                        help="input folder, overrides the config")
    parser.add_argument("--event_folder", type=str,
                        help="event input folder, overrides the config")
    parser.add_argument("--output", type=str,
                        help="output folder, overrides the config")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint")
    parser.add_argument("--end_frame", type=int, default=None,
                        help="stop after this many frames (debugging)")
    parser.add_argument("--viz_port", type=int, default=None,
                        help="serve the interactive browser viewer on this "
                             "port for the duration of the run (the live "
                             "frontend of the reference's SLAMFrontend)")
    nice_parser = parser.add_mutually_exclusive_group(required=False)
    nice_parser.add_argument("--nice", dest="nice", action="store_true")
    nice_parser.add_argument("--imap", dest="nice", action="store_false")
    parser.set_defaults(nice=True)
    args = parser.parse_args()

    from evennicer_slam_tpu.utils.runtime import setup_jax

    setup_jax()

    from evennicer_slam_tpu.config import default_config_path, load_config
    from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM
    from evennicer_slam_tpu.utils.logger import CheckpointLogger

    cfg = load_config(args.config, default_config_path(args.nice))
    slam = EvenNICERSLAM(cfg, args, nice=args.nice)

    start = 0
    if args.resume:
        ckpt = CheckpointLogger.latest(os.path.join(slam.output, "ckpts"))
        if ckpt:
            start = CheckpointLogger.restore(slam, ckpt)
            print(f"Resumed from {ckpt} at frame {start}")

    if args.viz_port is not None:
        from evennicer_slam_tpu.tools.viz_server import serve

        serve(slam.output, port=args.viz_port, blocking=False)

    # Resumed runs go through run() too, so the mesh/ckpt cadence and the
    # final final_mesh.ply / final_mesh_eval_rec.ply artifacts are identical
    # to an uninterrupted run (reference src/Mapper.py:858-876).
    slam.run(end_frame=args.end_frame, start_frame=start)


if __name__ == "__main__":
    main()

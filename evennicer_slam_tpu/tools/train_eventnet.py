"""Train EventNet on synthetic ESIM-style data and save .npz weights.

The reference ships only a pretrained torch checkpoint (its training code is
not in the repo); this tool provides the capability natively.

Usage:
    python -m evennicer_slam_tpu.tools.train_eventnet --out pretrained/eventnet.npz \
        [--steps 400] [--batch 4] [--height 64 --width 96]
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="pretrained/eventnet_synth.npz")
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--height", type=int, default=64)
    parser.add_argument("--width", type=int, default=96)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from evennicer_slam_tpu.utils.runtime import setup_jax

    setup_jax()

    from evennicer_slam_tpu.models.eventnet_train import (
        save_eventnet_npz,
        train_eventnet,
    )

    params = train_eventnet(
        steps=args.steps, batch=args.batch, hw=(args.height, args.width),
        lr=args.lr, seed=args.seed, verbose=True,
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_eventnet_npz(params, args.out)
    print("saved", args.out)


if __name__ == "__main__":
    main()

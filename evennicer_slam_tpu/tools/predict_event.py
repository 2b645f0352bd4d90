"""Standalone EventNet prediction CLI.

Rebuild of the reference's `python src/event_net.py` entry point
(reference src/event_net.py:101-173): load a trained 2-head UNet
(torch ``.pth`` via the converter, or native ``.npz``), feed it a pair of
intensity images, and write the predicted event image and binary existence
mask as PNGs.

Usage:
    python -m evennicer_slam_tpu.tools.predict_event \
        --model pretrained/eventnet.npz -img1 a.png -img2 b.png \
        [--scale 0.5] [--mask-threshold 0.5] [--event out_event.png] \
        [--binary out_mask.png]
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def event_to_image(event: np.ndarray) -> np.ndarray:
    """[-, +] polarity channels -> RGB uint8 (neg red, pos green), matching
    reference event_to_image scaling (src/event_net.py:125-127)."""
    h, w = event.shape[:2]
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.clip(event[..., 0] * 50, 0, 255).astype(np.uint8)
    img[..., 1] = np.clip(event[..., 1] * 50, 0, 255).astype(np.uint8)
    return img


def mask_to_image(mask: np.ndarray) -> np.ndarray:
    return (np.clip(mask, 0, 1) * 255).astype(np.uint8)


def load_model(path: str):
    if path.endswith(".npz"):
        from evennicer_slam_tpu.models.eventnet_train import load_eventnet_npz

        return load_eventnet_npz(path)
    from evennicer_slam_tpu.models.eventnet import load_eventnet_torch

    return load_eventnet_torch(path)


def predict(model, img1: np.ndarray, img2: np.ndarray, scale: float,
            threshold: float):
    """(event [h, w, 2], binary mask [h, w]) at ``scale`` x input size."""
    import jax.numpy as jnp

    from evennicer_slam_tpu.models.eventnet import inference_event
    from evennicer_slam_tpu.ops.resize import resize_bilinear

    hw = (int(img1.shape[0] * scale), int(img1.shape[1] * scale))
    a = resize_bilinear(jnp.asarray(img1, jnp.float32) / 255.0, hw)
    b = resize_bilinear(jnp.asarray(img2, jnp.float32) / 255.0, hw)
    event, mask = inference_event(model, a, b)  # mask: [1, h, w, 2]
    binary = np.asarray(mask)[0, ..., 1] > threshold
    return np.asarray(event), binary.astype(np.float32)


def main():
    parser = argparse.ArgumentParser(
        description="Predict event images from an intensity-image pair"
    )
    parser.add_argument("--model", "-m", required=True)
    parser.add_argument("--input1", "-img1", required=True)
    parser.add_argument("--input2", "-img2", required=True)
    parser.add_argument("--event", "-e", default=None,
                        help="output event PNG (default <img1>_<img2>_event.png)")
    parser.add_argument("--binary", "-b", default=None,
                        help="output binary mask PNG")
    parser.add_argument("--mask-threshold", "-t", type=float, default=0.5)
    parser.add_argument("--scale", "-s", type=float, default=0.5)
    args = parser.parse_args()

    stem = (os.path.splitext(os.path.basename(args.input1))[0] + "_"
            + os.path.splitext(os.path.basename(args.input2))[0])
    event_file = args.event or f"{stem}_event.png"
    binary_file = args.binary or f"{stem}_binary.png"

    raw1 = cv2.imread(args.input1)
    raw2 = cv2.imread(args.input2)
    if raw1 is None:
        raise SystemExit(f"cannot read image {args.input1}")
    if raw2 is None:
        raise SystemExit(f"cannot read image {args.input2}")
    img1 = cv2.cvtColor(raw1, cv2.COLOR_BGR2RGB)
    img2 = cv2.cvtColor(raw2, cv2.COLOR_BGR2RGB)
    model = load_model(args.model)
    event, binary = predict(model, img1, img2, args.scale, args.mask_threshold)

    cv2.imwrite(event_file, cv2.cvtColor(event_to_image(event), cv2.COLOR_RGB2BGR))
    cv2.imwrite(binary_file, mask_to_image(binary))
    print(f"event saved to {event_file}")
    print(f"binary mask saved to {binary_file}")


if __name__ == "__main__":
    main()

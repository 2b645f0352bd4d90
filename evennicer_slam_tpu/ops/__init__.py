"""TPU compute ops: trilinear grid sampling, image resize, Gaussian blur.

These are the framework's device-side primitives, written to match the exact
numerical semantics the reference got from torch/torchvision (F.grid_sample,
transforms.Resize, gaussian_blur) while being jittable and TPU-friendly.
"""

from evennicer_slam_tpu.ops.grid_sample import sample_grid_trilinear
from evennicer_slam_tpu.ops.resize import resize_nearest, resize_bilinear
from evennicer_slam_tpu.ops.gaussian_blur import gaussian_blur

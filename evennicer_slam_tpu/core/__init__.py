"""Pure, jittable SLAM math: rays, poses, sampling, volume compositing, bounds.

TPU-native replacement for the reference L0 layer (reference src/common.py).
Everything here is functional, differentiable where the reference is, and uses
fixed shapes + masking instead of boolean filtering.
"""

from evennicer_slam_tpu.core.quaternion import (
    quat_to_rotation,
    pose_matrix_from_tensor,
    tensor_from_pose_matrix,
)
from evennicer_slam_tpu.core.rays import (
    get_rays,
    get_rays_rescale,
    rays_from_uv,
    sample_pixels,
)
from evennicer_slam_tpu.core.sampling import sample_pdf, stratified_z_vals
from evennicer_slam_tpu.core.composite import composite_rays
from evennicer_slam_tpu.core.bounds import (
    normalize_3d_coordinate,
    ray_bound_exit,
    inside_bound_mask,
)

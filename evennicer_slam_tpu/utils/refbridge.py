"""Import shims that make the ACTUAL reference code at /root/reference
importable and runnable on CPU, so parity tests can pin this repo's numerics
against the reference implementation itself instead of hand-written goldens
(round-3 verdict item 1).

Three blockers, three minimal shims (none change reference semantics):

1. ``torchvision`` is not installed. The reference uses only
   ``transforms.Resize`` (nearest/bilinear) and
   ``transforms.functional.gaussian_blur`` (src/Tracker.py:136-139,211-214);
   both are reproduced here on top of ``torch.nn.functional``.
2. ``mathutils`` (Blender) is not installed. The reference uses only
   ``Matrix(R).to_quaternion()`` inside ``get_tensor_from_camera``
   (src/common.py:242-244); shimmed with the standard Shepperd
   matrix->quaternion conversion returning [w, x, y, z] like Blender.
3. CUDA-isms on CPU: ``quad2rotation`` does ``.to(quad.get_device())`` and
   ``NICE.forward`` does ``.to(f'cuda:{p.get_device()}')``
   (src/common.py:202, src/conv_onet/models/decoder.py:317). On CPU
   ``get_device()`` returns -1, so ``.to(-1)`` / ``.to('cuda:-1')`` would
   raise; a patched ``torch.Tensor.to`` maps exactly those two targets to
   'cpu' and passes everything else through unchanged.

A ``wandb`` stub is also installed (src/utils/Visualizer.py imports it at
module level; nothing is logged unless the visualizer fires).

Import this module BEFORE importing anything from ``src`` (the reference).
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    class InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"

    class Resize:
        """transforms.Resize for CHW / NCHW tensors (the only way the
        reference calls it: src/Tracker.py:136-149)."""

        def __init__(self, size, interpolation=InterpolationMode.BILINEAR,
                     antialias=None):
            self.size = tuple(size)
            self.interpolation = interpolation

        def __call__(self, img):
            unbatched = img.dim() == 3
            if unbatched:
                img = img[None]
            # torchvision casts non-float tensors to float for interpolate
            # and back afterwards (_cast_squeeze_in/_cast_squeeze_out)
            orig_dtype = img.dtype
            if not img.is_floating_point():
                img = img.to(torch.float32)
            if self.interpolation == "nearest":
                out = F.interpolate(img, size=self.size, mode="nearest")
            else:
                out = F.interpolate(
                    img, size=self.size, mode="bilinear", align_corners=False
                )
            if out.dtype != orig_dtype:
                out = (out.round() if not torch.tensor(
                    0, dtype=orig_dtype).is_floating_point() else out
                ).to(orig_dtype)
            return out[0] if unbatched else out

    def _gaussian_kernel1d(kernel_size: int, sigma: float):
        half = (kernel_size - 1) * 0.5
        x = torch.linspace(-half, half, steps=kernel_size)
        pdf = torch.exp(-0.5 * (x / sigma) ** 2)
        return pdf / pdf.sum()

    def gaussian_blur(img, kernel_size, sigma=None):
        """torchvision.transforms.functional.gaussian_blur semantics:
        default sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8, reflect pad,
        separable conv (matches the repo's ops/gaussian_blur golden tests)."""
        if isinstance(kernel_size, int):
            kernel_size = [kernel_size, kernel_size]
        if sigma is None:
            sigma = [0.3 * ((k - 1) * 0.5 - 1) + 0.8 for k in kernel_size]
        elif isinstance(sigma, (int, float)):
            sigma = [float(sigma), float(sigma)]
        unbatched = img.dim() == 3
        if unbatched:
            img = img[None]
        c = img.shape[1]
        dtype = img.dtype if img.is_floating_point() else torch.float32
        ky = _gaussian_kernel1d(kernel_size[0], sigma[0]).to(dtype)
        kx = _gaussian_kernel1d(kernel_size[1], sigma[1]).to(dtype)
        kernel = torch.outer(ky, kx)[None, None].expand(c, 1, -1, -1)
        pad = [kernel_size[1] // 2, kernel_size[1] // 2,
               kernel_size[0] // 2, kernel_size[0] // 2]
        out = F.conv2d(F.pad(img.to(dtype), pad, mode="reflect"),
                       kernel, groups=c)
        return out[0] if unbatched else out

    functional.gaussian_blur = gaussian_blur
    transforms.Resize = Resize
    transforms.InterpolationMode = InterpolationMode
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def _install_mathutils_stub():
    if "mathutils" in sys.modules:
        return

    mathutils = types.ModuleType("mathutils")

    class Matrix:
        def __init__(self, rows):
            self._m = np.asarray(rows, dtype=np.float64)

        def to_quaternion(self):
            """Rotation matrix -> quaternion [w, x, y, z], w >= 0 (Blender's
            Matrix.to_quaternion result up to the q/-q equivalence)."""
            m = self._m[:3, :3]
            t = np.trace(m)
            if t > 0:
                s = np.sqrt(t + 1.0) * 2.0
                w = 0.25 * s
                x = (m[2, 1] - m[1, 2]) / s
                y = (m[0, 2] - m[2, 0]) / s
                z = (m[1, 0] - m[0, 1]) / s
            elif m[0, 0] >= m[1, 1] and m[0, 0] >= m[2, 2]:
                s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2.0
                w = (m[2, 1] - m[1, 2]) / s
                x = 0.25 * s
                y = (m[0, 1] + m[1, 0]) / s
                z = (m[0, 2] + m[2, 0]) / s
            elif m[1, 1] >= m[2, 2]:
                s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2.0
                w = (m[0, 2] - m[2, 0]) / s
                x = (m[0, 1] + m[1, 0]) / s
                y = 0.25 * s
                z = (m[1, 2] + m[2, 1]) / s
            else:
                s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2.0
                w = (m[1, 0] - m[0, 1]) / s
                x = (m[0, 2] + m[2, 0]) / s
                y = (m[1, 2] + m[2, 1]) / s
                z = 0.25 * s
            q = np.array([w, x, y, z], dtype=np.float64)
            if q[0] < 0:
                q = -q
            return q / np.linalg.norm(q)

    mathutils.Matrix = Matrix
    sys.modules["mathutils"] = mathutils


def _install_wandb_stub():
    if "wandb" in sys.modules:
        return
    wandb = types.ModuleType("wandb")

    class _Experiment:
        def log(self, *a, **k):
            pass

        def finish(self, *a, **k):
            pass

    wandb.init = lambda *a, **k: _Experiment()
    wandb.log = lambda *a, **k: None
    wandb.Image = lambda *a, **k: None
    sys.modules["wandb"] = wandb


_TO_PATCHED = False


def _patch_tensor_to_for_cpu():
    """Map exactly the two CUDA-ism targets the reference produces on CPU
    (``.to(-1)`` from quad2rotation, ``.to('cuda:-1')`` from NICE.forward /
    get_tensor_from_camera) to 'cpu'; every other call passes through."""
    global _TO_PATCHED
    if _TO_PATCHED:
        return
    import torch

    orig_to = torch.Tensor.to

    def patched_to(self, *args, **kwargs):
        if args and (args[0] == -1 or args[0] == "cuda:-1"):
            args = ("cpu",) + args[1:]
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = patched_to
    _TO_PATCHED = True


def install():
    """Install all shims and put /root/reference on sys.path."""
    _install_torchvision_stub()
    _install_mathutils_stub()
    _install_wandb_stub()
    _patch_tensor_to_for_cpu()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def reference_available() -> bool:
    import os

    return os.path.isdir(REFERENCE_ROOT + "/src")

"""Separable Gaussian blur matching ``torchvision.transforms.functional.gaussian_blur``.

Used by the event-loss blur pyramid (reference src/Tracker.py:208-220,
src/Mapper.py:596-615). torchvision derives sigma from the kernel size as
``0.3 * ((k - 1) * 0.5 - 1) + 0.8`` and pads with reflection; both reproduced
here. Implemented as shifted-accumulate (small static kernels), which XLA
fuses into a handful of VPU ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _gaussian_kernel1d(ksize: int, sigma: float | None = None) -> np.ndarray:
    if sigma is None:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float32) - (ksize - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(
    img: jnp.ndarray, ksize: int, sigma: float | None = None
) -> jnp.ndarray:
    """Blur ``[H, W, C]`` (or ``[H, W]``) with a ksize x ksize Gaussian,
    reflect padding. ``ksize`` must be odd and static."""
    k = _gaussian_kernel1d(ksize, sigma)
    r = ksize // 2

    def blur_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, r)
        xp = jnp.pad(x, pad, mode="reflect")
        out = None
        for t in range(ksize):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(t, t + x.shape[axis])
            term = k[t] * xp[tuple(sl)]
            out = term if out is None else out + term
        return out

    return blur_axis(blur_axis(img, 0), 1)

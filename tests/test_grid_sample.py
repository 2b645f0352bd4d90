"""Golden tests: our trilinear grid sampler vs torch F.grid_sample with the
exact reference call signature (padding_mode='border', align_corners=True)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from evennicer_slam_tpu.ops.grid_sample import sample_grid_trilinear
from evennicer_slam_tpu.ops.gaussian_blur import gaussian_blur
from evennicer_slam_tpu.ops.resize import resize_bilinear, resize_nearest


def torch_reference_sample(grid_zyxc, p_nor):
    """The reference sampling path (src/conv_onet/models/decoder.py:168-175):
    grid [1, C, Z, Y, X], vgrid [1, N, 1, 1, 3] with (x, y, z) coords."""
    g = torch.from_numpy(np.transpose(grid_zyxc, (3, 0, 1, 2))[None])  # [1,C,Z,Y,X]
    v = torch.from_numpy(p_nor)[None, :, None, None, :]
    out = F.grid_sample(
        g, v, padding_mode="border", align_corners=True, mode="bilinear"
    )
    return out.squeeze(-1).squeeze(-1)[0].T.numpy()  # [N, C]


class TestGridSample:
    def test_matches_torch_inside(self, rng):
        grid = rng.normal(size=(5, 6, 7, 4)).astype(np.float32)
        p = rng.uniform(-0.99, 0.99, size=(200, 3)).astype(np.float32)
        ours = np.asarray(sample_grid_trilinear(jnp.asarray(grid), jnp.asarray(p)))
        ref = torch_reference_sample(grid, p)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_matches_torch_border(self, rng):
        grid = rng.normal(size=(4, 4, 4, 3)).astype(np.float32)
        p = rng.uniform(-1.8, 1.8, size=(300, 3)).astype(np.float32)
        ours = np.asarray(sample_grid_trilinear(jnp.asarray(grid), jnp.asarray(p)))
        ref = torch_reference_sample(grid, p)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_exact_at_grid_nodes(self, rng):
        grid = rng.normal(size=(3, 4, 5, 2)).astype(np.float32)
        # normalized coordinate of node (z=1, y=2, x=3)
        p = np.array([[3 / 4 * 2 - 1, 2 / 3 * 2 - 1, 1 / 2 * 2 - 1]], np.float32)
        ours = np.asarray(sample_grid_trilinear(jnp.asarray(grid), jnp.asarray(p)))
        np.testing.assert_allclose(ours[0], grid[1, 2, 3], atol=1e-5)


class TestResize:
    def test_nearest_matches_torch(self, rng):
        img = rng.normal(size=(20, 31, 2)).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(img), (3, 4)))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(img).permute(2, 0, 1)[None], size=(3, 4), mode="nearest"
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, t, atol=1e-6)

    def test_bilinear_matches_torch(self, rng):
        img = rng.normal(size=(17, 23, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(img), (5, 9)))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(img).permute(2, 0, 1)[None], size=(5, 9),
            mode="bilinear", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)

    def test_bilinear_2d(self, rng):
        img = rng.normal(size=(16, 16)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(img), (4, 4)))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(img)[None, None], size=(4, 4),
            mode="bilinear", align_corners=False,
        )[0, 0].numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)


def torchvision_style_blur(img_chw: torch.Tensor, ksize: int) -> torch.Tensor:
    """Recompute torchvision.transforms.functional.gaussian_blur semantics:
    sigma = 0.3*((k-1)*0.5 - 1) + 0.8, separable conv, reflect padding."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = torch.arange(ksize, dtype=torch.float32) - (ksize - 1) / 2
    k1d = torch.exp(-(x**2) / (2 * sigma**2))
    k1d = k1d / k1d.sum()
    C = img_chw.shape[0]
    kernel = (k1d[:, None] * k1d[None, :]).expand(C, 1, ksize, ksize)
    pad = ksize // 2
    padded = torch.nn.functional.pad(
        img_chw[None], (pad, pad, pad, pad), mode="reflect"
    )
    return torch.nn.functional.conv2d(padded, kernel, groups=C)[0]


class TestGaussianBlur:
    def test_matches_torchvision_semantics(self, rng):
        img = rng.uniform(size=(24, 30, 2)).astype(np.float32)
        ours = np.asarray(gaussian_blur(jnp.asarray(img), 9))
        t = torchvision_style_blur(
            torch.from_numpy(img).permute(2, 0, 1), 9
        ).permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)

    def test_kernel3(self, rng):
        img = rng.uniform(size=(10, 11)).astype(np.float32)
        ours = np.asarray(gaussian_blur(jnp.asarray(img), 3))
        t = torchvision_style_blur(torch.from_numpy(img)[None], 3)[0].numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)

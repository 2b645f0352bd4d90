"""Unit tests for core math: quaternions, rays, compositing, sampling, bounds.

Golden values come from independent torch/numpy re-computation of the
reference formulas (reference src/common.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from evennicer_slam_tpu.core import (
    composite_rays,
    get_rays,
    get_rays_rescale,
    inside_bound_mask,
    normalize_3d_coordinate,
    pose_matrix_from_tensor,
    quat_to_rotation,
    ray_bound_exit,
    sample_pdf,
    tensor_from_pose_matrix,
)
from evennicer_slam_tpu.core.rays import rays_from_uv, sample_pixels
from evennicer_slam_tpu.core.sampling import stratified_z_vals, surface_z_vals


def torch_quad2rotation(quad):
    # reference src/common.py:189-212
    bs = quad.shape[0]
    qr, qi, qj, qk = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
    two_s = 2.0 / (quad * quad).sum(-1)
    rot = torch.zeros(bs, 3, 3)
    rot[:, 0, 0] = 1 - two_s * (qj**2 + qk**2)
    rot[:, 0, 1] = two_s * (qi * qj - qk * qr)
    rot[:, 0, 2] = two_s * (qi * qk + qj * qr)
    rot[:, 1, 0] = two_s * (qi * qj + qk * qr)
    rot[:, 1, 1] = 1 - two_s * (qi**2 + qk**2)
    rot[:, 1, 2] = two_s * (qj * qk - qi * qr)
    rot[:, 2, 0] = two_s * (qi * qk - qj * qr)
    rot[:, 2, 1] = two_s * (qj * qk + qi * qr)
    rot[:, 2, 2] = 1 - two_s * (qi**2 + qj**2)
    return rot


class TestQuaternion:
    def test_matches_reference_formula(self, rng):
        q = rng.normal(size=(8, 4)).astype(np.float32)
        ours = np.asarray(quat_to_rotation(jnp.asarray(q)))
        theirs = torch_quad2rotation(torch.from_numpy(q)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_round_trip(self, rng):
        q = rng.normal(size=(16, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q[q[:, 0] < 0] *= -1
        t = rng.normal(size=(16, 3)).astype(np.float32)
        vec = jnp.asarray(np.concatenate([q, t], axis=-1))
        RT = pose_matrix_from_tensor(vec)
        back = tensor_from_pose_matrix(RT)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vec), atol=1e-5)

    def test_rotation_to_quat_degenerate_branches(self):
        # rotations that hit each branch of the conversion
        mats = [
            np.eye(3),
            np.diag([1.0, -1.0, -1.0]),   # trace < 0, m00 pivot
            np.diag([-1.0, 1.0, -1.0]),   # m11 pivot
            np.diag([-1.0, -1.0, 1.0]),   # m22 pivot
        ]
        for m in mats:
            RT = np.eye(4)[:3]
            RT[:3, :3] = m
            vec = tensor_from_pose_matrix(jnp.asarray(RT, dtype=jnp.float32))
            R2 = np.asarray(pose_matrix_from_tensor(vec))[:3, :3]
            np.testing.assert_allclose(R2, m, atol=1e-5)

    def test_differentiable(self):
        vec = jnp.array([1.0, 0.1, -0.2, 0.05, 1.0, 2.0, 3.0])
        g = jax.grad(lambda v: jnp.sum(pose_matrix_from_tensor(v)))(vec)
        assert np.all(np.isfinite(np.asarray(g)))


class TestRays:
    H, W = 12, 20
    fx, fy, cx, cy = 15.0, 16.0, 9.5, 5.5

    def _torch_get_rays(self, c2w):
        # reference src/common.py:300-318
        i, j = torch.meshgrid(
            torch.linspace(0, self.W - 1, self.W),
            torch.linspace(0, self.H - 1, self.H),
            indexing="ij",
        )
        i, j = i.t(), j.t()
        dirs = torch.stack(
            [(i - self.cx) / self.fx, -(j - self.cy) / self.fy, -torch.ones_like(i)], -1
        )
        dirs = dirs.reshape(self.H, self.W, 1, 3)
        rays_d = torch.sum(dirs * c2w[:3, :3], -1)
        rays_o = c2w[:3, -1].expand(rays_d.shape)
        return rays_o, rays_d

    def test_full_image_rays_match_reference(self, rng):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = torch_quad2rotation(
            torch.tensor([[0.9, 0.1, 0.2, -0.1]])
        ).numpy()[0]
        c2w[:3, 3] = [0.3, -0.2, 1.0]
        ro, rd = get_rays(self.H, self.W, self.fx, self.fy, self.cx, self.cy, jnp.asarray(c2w))
        tro, trd = self._torch_get_rays(torch.from_numpy(c2w))
        np.testing.assert_allclose(np.asarray(rd), trd.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ro), tro.numpy(), atol=1e-6)

    def test_rescale_rays_span_original_plane(self):
        c2w = jnp.eye(4)
        ro, rd = get_rays_rescale(
            self.H, self.W, 6, 10, self.fx, self.fy, self.cx, self.cy, c2w
        )
        full_o, full_d = get_rays(
            self.H, self.W, self.fx, self.fy, self.cx, self.cy, c2w
        )
        # corners of the rescaled grid == corners of the full grid
        np.testing.assert_allclose(rd[0, 0], full_d[0, 0], atol=1e-6)
        np.testing.assert_allclose(rd[-1, -1], full_d[-1, -1], atol=1e-6)

    def test_sample_pixels_in_region(self):
        key = jax.random.PRNGKey(0)
        i, j = sample_pixels(key, 500, 2, 10, 3, 17)
        assert np.all((np.asarray(i) >= 3) & (np.asarray(i) < 17))
        assert np.all((np.asarray(j) >= 2) & (np.asarray(j) < 10))

    def test_rays_from_uv_differentiable_in_pose(self):
        i = jnp.array([1.0, 2.0])
        j = jnp.array([3.0, 4.0])

        def f(c2w):
            ro, rd = rays_from_uv(i, j, c2w, self.fx, self.fy, self.cx, self.cy)
            return jnp.sum(ro) + jnp.sum(rd)

        g = jax.grad(f)(jnp.eye(4))
        assert np.any(np.asarray(g) != 0)


class TestComposite:
    def _torch_raw2outputs(self, raw, z_vals, rays_d, occupancy):
        # reference src/common.py:256-297 (without the in-place mutation)
        raw = raw.clone()
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = torch.cat(
            [dists, torch.tensor([1e10]).expand(dists[..., :1].shape)], -1
        )
        dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
        rgb = raw[..., :-1]
        if occupancy:
            alpha = torch.sigmoid(10 * raw[..., -1])
        else:
            alpha = 1.0 - torch.exp(-torch.relu(raw[..., -1]) * dists)
        weights = alpha.float() * torch.cumprod(
            torch.cat(
                [torch.ones((alpha.shape[0], 1)), (1.0 - alpha + 1e-10).float()], -1
            ),
            -1,
        )[:, :-1]
        rgb_map = torch.sum(weights[..., None] * rgb, -2)
        depth_map = torch.sum(weights * z_vals, -1)
        tmp = z_vals - depth_map.unsqueeze(-1)
        depth_var = torch.sum(weights * tmp * tmp, dim=1)
        return depth_map, depth_var, rgb_map, weights

    @pytest.mark.parametrize("occupancy", [True, False])
    def test_matches_reference(self, rng, occupancy):
        N, S = 7, 24
        raw = rng.normal(size=(N, S, 4)).astype(np.float32)
        z = np.sort(rng.uniform(0.1, 5.0, size=(N, S)).astype(np.float32), axis=-1)
        rd = rng.normal(size=(N, 3)).astype(np.float32)
        ours = composite_rays(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), occupancy)
        theirs = self._torch_raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z), torch.from_numpy(rd), occupancy
        )
        for a, b in zip(ours, theirs):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=2e-4, atol=2e-5)


class TestSampling:
    def test_sample_pdf_det_matches_torch(self, rng):
        N, B = 5, 16
        bins = np.sort(rng.uniform(0, 4, size=(N, B)).astype(np.float32), axis=-1)
        weights = rng.uniform(0, 1, size=(N, B - 1)).astype(np.float32)
        ours = sample_pdf(
            jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights), 8, det=True
        )
        # torch reference computation (src/common.py:19-63)
        tw = torch.from_numpy(weights) + 1e-5
        pdf = tw / tw.sum(-1, keepdim=True)
        cdf = torch.cumsum(pdf, -1)
        cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
        u = torch.linspace(0.0, 1.0, 8).expand(N, 8).contiguous()
        inds = torch.searchsorted(cdf, u, right=True)
        below = torch.max(torch.zeros_like(inds - 1), inds - 1)
        above = torch.min((cdf.shape[-1] - 1) * torch.ones_like(inds), inds)
        inds_g = torch.stack([below, above], -1)
        matched = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
        cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched), 2, inds_g)
        bins_g = torch.gather(
            torch.from_numpy(bins).unsqueeze(1).expand(matched), 2,
            torch.minimum(inds_g, torch.tensor(B - 1)),
        )
        denom = cdf_g[..., 1] - cdf_g[..., 0]
        denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
        t = (u - cdf_g[..., 0]) / denom
        expected = bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])
        np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=1e-5)

    def test_stratified_deterministic(self):
        z = stratified_z_vals(jnp.asarray(0.1), jnp.asarray(2.0), 8)
        np.testing.assert_allclose(np.asarray(z), np.linspace(0.1, 2.0, 8), atol=1e-6)

    def test_surface_z_vals_zero_depth_fallback(self):
        d = jnp.array([2.0, 0.0])
        z = surface_z_vals(d, 4)
        np.testing.assert_allclose(np.asarray(z[0]), [1.9, 1.9 + 0.2 / 3, 1.9 + 0.4 / 3, 2.1], atol=1e-5)
        # zero-depth ray: uniform [0.001, max depth]
        np.testing.assert_allclose(np.asarray(z[1][0]), 0.001, atol=1e-6)
        np.testing.assert_allclose(np.asarray(z[1][-1]), 2.0, atol=1e-6)


class TestBounds:
    bound = jnp.asarray(np.array([[-1.0, 2.0], [-2.0, 3.0], [0.0, 4.0]], np.float32))

    def test_normalize(self):
        p = jnp.asarray(np.array([[-1.0, -2.0, 0.0], [2.0, 3.0, 4.0], [0.5, 0.5, 2.0]], np.float32))
        out = np.asarray(normalize_3d_coordinate(p, self.bound))
        np.testing.assert_allclose(out[0], [-1, -1, -1], atol=1e-6)
        np.testing.assert_allclose(out[1], [1, 1, 1], atol=1e-6)

    def test_ray_bound_exit_axis_aligned(self):
        o = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
        d = jnp.asarray(np.array([[1.0, 0.0, 0.0]], np.float32))
        t = np.asarray(ray_bound_exit(o, d, self.bound))
        np.testing.assert_allclose(t, [2.0], atol=1e-5)

    def test_inside_mask(self):
        o = jnp.zeros((2, 3)) + jnp.array([0.0, 0.0, 1.0])
        d = jnp.asarray(np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32))
        depth = jnp.array([1.5, 2.5])
        m = np.asarray(inside_bound_mask(o, d, depth, self.bound))
        assert m.tolist() == [True, False]

"""Reference-in-the-loop parity: the ACTUAL reference implementation from
/root/reference (imported via tests/ref_shims.py, run on CPU torch) is the
golden against identical converted weights and identical inputs.

This retires the hand-written-golden risk: a shared misreading between a
re-derived golden and the implementation is undetectable, but these tests
execute the reference code itself:

- NICE.forward at all four stages        (src/conv_onet/models/decoder.py:312-342)
- Renderer.eval_points / render_batch_ray, occupancy and imap-density modes,
  incl. the zero-depth surface fallback and N_importance resampling
                                         (src/utils/Renderer.py:24-199)
- sample_pdf / raw2outputs_nerf_color / ray generation
                                         (src/common.py:19-63,74-89,256-340)
- the tracker's RGB-D loss AND its pose gradient at a fixed pose with
  injected identical pixels              (src/Tracker.py:163-201)
- the tracker's EVENT-loss chain — NEAREST resizes, render_img_rescale,
  the real UNet_2heads, L2 + gaussian-blur pyramid (unblurred_weight quirk
  included), balancer, the never-backpropagated mask CE — loss AND pose
  gradient                               (src/Tracker.py:129-157,204-233)
"""

import numpy as np
import pytest

import ref_shims

if not ref_shims.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

ref_shims.install()

import torch  # noqa: E402

from src import common as ref_common  # noqa: E402
from src.conv_onet.models import decoder as ref_decoder  # noqa: E402
from src.utils.Renderer import Renderer as RefRenderer  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from evennicer_slam_tpu.core.composite import composite_rays  # noqa: E402
from evennicer_slam_tpu.core.quaternion import (  # noqa: E402
    pose_matrix_from_tensor,
    tensor_from_pose_matrix_np,
)
from evennicer_slam_tpu.core.rays import (  # noqa: E402
    get_rays,
    get_rays_rescale,
    rays_from_uv,
)
from evennicer_slam_tpu.core.sampling import sample_pdf  # noqa: E402
from evennicer_slam_tpu.models.decoders import nice_forward  # noqa: E402
from evennicer_slam_tpu.models.grids import init_grids  # noqa: E402
from evennicer_slam_tpu.models.pretrained import _mlp_from_torch  # noqa: E402
from evennicer_slam_tpu.render.renderer import (  # noqa: E402
    RenderSettings,
    eval_points,
    render_rays,
)

BOUND = np.array([[-1.0, 1.6], [-1.2, 1.4], [-0.8, 1.2]], np.float64)
GRID_LEN = {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16}
C_DIM = 32
HIDDEN = 32
H, W = 48, 48
FX = FY = 40.0
CX = CY = 24.0
CAM7 = np.array([0.99, 0.05, -0.03, 0.02, 0.2, 0.1, 1.0], np.float32)


def _torch_grids(grids_jax):
    """Repo [Z,Y,X,C] grids -> reference c_grid dict of [1,C,Z,Y,X] tensors
    (the layout reference grid_init allocates, src/EvenNICER_SLAM.py:238-275)."""
    out = {}
    for level, g in grids_jax.items():
        arr = np.transpose(np.asarray(g), (3, 0, 1, 2))[None]
        out[f"grid_{level}"] = torch.from_numpy(arr.copy())
    return out


@pytest.fixture(scope="module")
def nice_pair():
    """(reference NICE module, converted repo decoders, jax grids, torch grids)."""
    torch.manual_seed(0)
    nice = ref_decoder.NICE(
        dim=3, c_dim=C_DIM,
        coarse_grid_len=GRID_LEN["coarse"], middle_grid_len=GRID_LEN["middle"],
        fine_grid_len=GRID_LEN["fine"], color_grid_len=GRID_LEN["color"],
        hidden_size=HIDDEN, coarse=True,
    )
    tb = torch.from_numpy(BOUND)  # float64, exactly like reference load_bound
    nice.bound = tb
    nice.middle_decoder.bound = tb
    nice.fine_decoder.bound = tb
    nice.color_decoder.bound = tb
    nice.coarse_decoder.bound = tb * 2  # coarse_bound_enlarge = 2

    state = {k: v.detach().numpy() for k, v in nice.state_dict().items()}
    decoders = {
        lvl: _mlp_from_torch(state, prefix=f"{lvl}_decoder.")
        for lvl in ("coarse", "middle", "fine", "color")
    }
    grids = init_grids(jax.random.PRNGKey(3), BOUND, GRID_LEN, C_DIM, coarse=True)
    return nice, decoders, grids, _torch_grids(grids)


@pytest.fixture(scope="module")
def imap_pair():
    """(reference imap MLP module, converted repo decoders)."""
    torch.manual_seed(1)
    mlp = ref_decoder.MLP(
        name="", dim=3, c_dim=0, color=True, skips=[], hidden_size=HIDDEN,
        n_blocks=4, pos_embedding_method="fourier",
    )
    state = {k: v.detach().numpy() for k, v in mlp.state_dict().items()}
    return mlp, {"imap": _mlp_from_torch(state)}


def _ref_renderer(nice: bool, occupancy: bool, n_importance: int = 0):
    cfg = {
        "rendering": {"lindisp": False, "perturb": 0.0, "N_samples": 32,
                      "N_surface": 16, "N_importance": n_importance},
        "scale": 1,
        "occupancy": occupancy,
    }

    class _Slam:
        pass

    slam = _Slam()
    slam.nice = nice
    slam.bound = torch.from_numpy(BOUND)
    slam.H, slam.W = H, W
    slam.fx, slam.fy, slam.cx, slam.cy = FX, FY, CX, CY
    return RefRenderer(cfg, None, slam)


def _settings(nice=True, occupancy=True, n_importance=0):
    return RenderSettings(
        n_samples=32, n_surface=16, n_importance=n_importance,
        lindisp=False, perturb=0.0, occupancy=occupancy, nice=nice,
        coarse_bound_enlarge=2.0,
    )


def _test_rays(rng, n=40, zero_depth_every=7):
    """Rays from a camera inside the bound; every ``zero_depth_every``-th ray
    gets depth 0 to exercise the zero-depth surface fallback."""
    c2w = np.asarray(pose_matrix_from_tensor(jnp.asarray(CAM7)))
    i = rng.integers(4, W - 4, size=n).astype(np.float32)
    j = rng.integers(4, H - 4, size=n).astype(np.float32)
    rays_o, rays_d = rays_from_uv(
        jnp.asarray(i), jnp.asarray(j), jnp.asarray(c2w), FX, FY, CX, CY
    )
    depth = rng.uniform(0.5, 1.2, size=n).astype(np.float32)
    depth[::zero_depth_every] = 0.0
    return np.asarray(rays_o), np.asarray(rays_d), depth, i, j


class TestQuatParity:
    def test_camera_from_tensor(self):
        """quad2rotation / get_camera_from_tensor (src/common.py:189-228) —
        non-unit quaternion exercises the two_s normalization."""
        t = torch.from_numpy(CAM7)
        ref = ref_common.get_camera_from_tensor(t).numpy()
        ours = np.asarray(pose_matrix_from_tensor(jnp.asarray(CAM7)))
        np.testing.assert_allclose(ours[:3, :4], ref, rtol=1e-6, atol=1e-6)

    def test_tensor_from_camera_roundtrip(self):
        """get_tensor_from_camera (src/common.py:231-253, mathutils shimmed)
        agrees with the repo conversion up to quaternion sign, and both
        round-trip through the reference's own quad->matrix code."""
        rng = np.random.default_rng(0)
        for _ in range(5):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            R = np.asarray(
                ref_common.quad2rotation(torch.from_numpy(q[None]).float())[0]
            )
            RT = np.concatenate([R, rng.normal(size=(3, 1))], axis=1).astype(
                np.float32
            )
            ref = ref_common.get_tensor_from_camera(torch.from_numpy(RT)).numpy()
            ours = np.asarray(tensor_from_pose_matrix_np(RT))
            if np.sign(ref[0]) != np.sign(ours[0]):
                ours = np.concatenate([-ours[:4], ours[4:]])
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
            back = ref_common.get_camera_from_tensor(
                torch.from_numpy(ours)
            ).numpy()
            np.testing.assert_allclose(back, RT, rtol=1e-4, atol=1e-5)


class TestRayParity:
    def test_get_rays_from_uv(self):
        rng = np.random.default_rng(1)
        c2w = np.asarray(pose_matrix_from_tensor(jnp.asarray(CAM7)))
        i = rng.integers(0, W, size=30).astype(np.float32)
        j = rng.integers(0, H, size=30).astype(np.float32)
        ro_r, rd_r = ref_common.get_rays_from_uv(
            torch.from_numpy(i), torch.from_numpy(j),
            torch.from_numpy(c2w), H, W, FX, FY, CX, CY, "cpu",
        )
        ro, rd = rays_from_uv(jnp.asarray(i), jnp.asarray(j),
                              jnp.asarray(c2w), FX, FY, CX, CY)
        np.testing.assert_allclose(np.asarray(ro), ro_r.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(rd), rd_r.numpy(), rtol=1e-6,
                                   atol=1e-6)

    def test_get_rays_full_image(self):
        c2w = np.asarray(pose_matrix_from_tensor(jnp.asarray(CAM7)))
        ro_r, rd_r = ref_common.get_rays(
            H, W, FX, FY, CX, CY, torch.from_numpy(c2w), "cpu"
        )
        ro, rd = get_rays(H, W, FX, FY, CX, CY, jnp.asarray(c2w))
        np.testing.assert_allclose(np.asarray(rd), rd_r.numpy(), rtol=1e-6,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ro), ro_r.numpy(), rtol=1e-6)

    def test_get_rays_rescale(self):
        c2w = np.asarray(pose_matrix_from_tensor(jnp.asarray(CAM7)))
        nh, nw = 7, 9
        ro_r, rd_r = ref_common.get_rays_rescale(
            H, W, nh, nw, FX, FY, CX, CY, torch.from_numpy(c2w), "cpu"
        )
        ro, rd = get_rays_rescale(H, W, nh, nw, FX, FY, CX, CY, jnp.asarray(c2w))
        np.testing.assert_allclose(np.asarray(rd), rd_r.numpy(), rtol=1e-5,
                                   atol=1e-6)


class TestCommonParity:
    def test_sample_pdf_det(self):
        rng = np.random.default_rng(2)
        bins = np.sort(rng.uniform(0, 2, size=(6, 31)), axis=-1).astype(np.float32)
        weights = rng.uniform(0, 1, size=(6, 30)).astype(np.float32)
        ref = ref_common.sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), 12, det=True,
            device="cpu",
        ).numpy()
        ours = np.asarray(
            sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                       jnp.asarray(weights), 12, det=True)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("occupancy", [True, False])
    def test_raw2outputs(self, occupancy):
        rng = np.random.default_rng(3)
        raw = rng.normal(size=(10, 20, 4)).astype(np.float32)
        z_vals = np.sort(rng.uniform(0.1, 2, size=(10, 20)), axis=-1).astype(np.float32)
        rays_d = rng.normal(size=(10, 3)).astype(np.float32)
        d_r, v_r, c_r, w_r = ref_common.raw2outputs_nerf_color(
            torch.from_numpy(raw.copy()), torch.from_numpy(z_vals),
            torch.from_numpy(rays_d), occupancy=occupancy, device="cpu",
        )
        d, v, c, w = composite_rays(
            jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d),
            occupancy=occupancy,
        )
        np.testing.assert_allclose(np.asarray(d), d_r.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), v_r.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c), c_r.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w), w_r.numpy(), rtol=1e-5, atol=1e-6)


class TestDecoderParity:
    @pytest.mark.parametrize("stage", ["coarse", "middle", "fine", "color"])
    def test_nice_forward_stages(self, nice_pair, stage):
        nice, decoders, grids, c_torch = nice_pair
        rng = np.random.default_rng(4)
        lo, hi = BOUND[:, 0] * 0.9, BOUND[:, 1] * 0.9
        pts = rng.uniform(lo, hi, size=(600, 3)).astype(np.float32)
        with torch.no_grad():
            ref = nice(torch.from_numpy(pts)[None], c_torch, stage=stage).numpy()
        ours = np.asarray(
            nice_forward(decoders, grids, jnp.asarray(pts),
                         jnp.asarray(BOUND, jnp.float32), stage)
        )
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_eval_points_oob_mask(self, nice_pair):
        """Out-of-bound points get occupancy +100 (src/utils/Renderer.py:42-58)."""
        nice, decoders, grids, c_torch = nice_pair
        rng = np.random.default_rng(5)
        pts = rng.uniform(BOUND[:, 0] - 1.0, BOUND[:, 1] + 1.0,
                          size=(400, 3)).astype(np.float32)
        renderer = _ref_renderer(nice=True, occupancy=True)
        with torch.no_grad():
            ref = renderer.eval_points(
                torch.from_numpy(pts), nice, c_torch, "color", "cpu"
            ).numpy()
        ours = np.asarray(
            eval_points(decoders, grids, jnp.asarray(pts),
                        jnp.asarray(BOUND, jnp.float32), "color", _settings())
        )
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


class TestRendererParity:
    def _compare(self, nice_pair, stage, n_importance=0, rtol=3e-4, atol=3e-4):
        nice, decoders, grids, c_torch = nice_pair
        rng = np.random.default_rng(6)
        rays_o, rays_d, depth, _, _ = _test_rays(rng)
        renderer = _ref_renderer(nice=True, occupancy=True,
                                 n_importance=n_importance)
        with torch.no_grad():
            d_r, u_r, c_r = renderer.render_batch_ray(
                c_torch, nice, torch.from_numpy(rays_d),
                torch.from_numpy(rays_o), "cpu", stage,
                gt_depth=None if stage == "coarse" else torch.from_numpy(depth),
            )
        d, u, c = render_rays(
            decoders, grids, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(BOUND, jnp.float32), stage,
            _settings(n_importance=n_importance),
            gt_depth=None if stage == "coarse" else jnp.asarray(depth),
        )
        np.testing.assert_allclose(np.asarray(d), d_r.numpy(), rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(u), u_r.numpy(), rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(c), c_r.numpy(), rtol=rtol, atol=atol)

    def test_color_stage_occupancy(self, nice_pair):
        """Depth-guided strat+surface sampling + zero-depth fallback + the
        repo's sort-free two-band compositor vs the reference's sorted
        composite (src/utils/Renderer.py:64-199)."""
        self._compare(nice_pair, "color")

    def test_coarse_stage(self, nice_pair):
        """Coarse stage ignores gt_depth: near=0.01, far=bound exit."""
        self._compare(nice_pair, "coarse")

    def test_importance_resampling(self, nice_pair):
        """N_importance > 0 path: det inverse-CDF resampling + re-render
        (src/utils/Renderer.py:180-197)."""
        self._compare(nice_pair, "color", n_importance=8)

    def test_imap_density_mode(self, imap_pair):
        """nice=False single-MLP decode, occupancy=False density compositing
        (the iMAP* configuration)."""
        mlp, decoders = imap_pair
        rng = np.random.default_rng(7)
        rays_o, rays_d, depth, _, _ = _test_rays(rng)
        renderer = _ref_renderer(nice=False, occupancy=False)
        with torch.no_grad():
            d_r, u_r, c_r = renderer.render_batch_ray(
                None, mlp, torch.from_numpy(rays_d), torch.from_numpy(rays_o),
                "cpu", "color", gt_depth=torch.from_numpy(depth),
            )
        d, u, c = render_rays(
            decoders, None, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(BOUND, jnp.float32), "color",
            _settings(nice=False, occupancy=False), gt_depth=jnp.asarray(depth),
        )
        np.testing.assert_allclose(np.asarray(d), d_r.numpy(), rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(u), u_r.numpy(), rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(c), c_r.numpy(), rtol=3e-4, atol=3e-4)


class TestTrackerLossParity:
    def test_rgbd_loss_and_pose_gradient(self, nice_pair, monkeypatch):
        """The tracker's per-iteration RGB-D loss AND its gradient wrt the
        7-vector camera tensor, with identical injected pixels, against the
        reference computation (src/Tracker.py:163-201: get_samples ->
        inside-bound filter -> render_batch_ray -> dynamic-masked depth term
        + w_color_loss * color term)."""
        nice, decoders, grids, c_torch = nice_pair
        rng = np.random.default_rng(8)
        n = 48
        i = rng.integers(8, W - 8, size=n).astype(np.float32)
        j = rng.integers(8, H - 8, size=n).astype(np.float32)
        b_depth = rng.uniform(0.5, 1.1, size=n).astype(np.float32)
        b_depth[::11] = 0.0  # depth-0 rays are loss-masked but still rendered
        b_color = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        w_color_loss = 0.5

        # ---- reference computation (actual reference code) ----
        cam_t = torch.tensor(CAM7, requires_grad=True)
        c2w_t = ref_common.get_camera_from_tensor(cam_t)
        ro_t, rd_t = ref_common.get_rays_from_uv(
            torch.from_numpy(i), torch.from_numpy(j), c2w_t,
            H, W, FX, FY, CX, CY, "cpu",
        )
        # reference inside-bound pre-filter (src/Tracker.py:164-173) — the
        # fixture rays are all inside, so filtering is the identity (asserted)
        with torch.no_grad():
            t = (torch.from_numpy(BOUND)[None].float()
                 - ro_t.detach()[..., None]) / rd_t.detach()[..., None]
            t_exit, _ = torch.min(torch.max(t, dim=2)[0], dim=1)
            inside = t_exit >= torch.from_numpy(b_depth)
        assert bool(inside.all()), "fixture rays must all pass the bound filter"
        renderer = _ref_renderer(nice=True, occupancy=True)
        depth_r, unc_r, color_r = renderer.render_batch_ray(
            c_torch, nice, rd_t, ro_t, "cpu", "color",
            gt_depth=torch.from_numpy(b_depth),
        )
        unc_r = unc_r.detach()
        gt_d = torch.from_numpy(b_depth)
        tmp = torch.abs(gt_d - depth_r) / torch.sqrt(unc_r + 1e-10)
        mask = (tmp < 10 * tmp.median()) & (gt_d > 0)
        loss_ref = tmp[mask].sum()
        loss_ref = loss_ref + w_color_loss * torch.abs(
            torch.from_numpy(b_color) - color_r
        )[mask].sum()
        loss_ref.backward()
        grad_ref = cam_t.grad.numpy().copy()

        # ---- repo computation with the same injected pixels ----
        from evennicer_slam_tpu.slam import tracker as tracker_mod
        from evennicer_slam_tpu.slam.camera import Camera

        ii, jj = jnp.asarray(i), jnp.asarray(j)
        bd, bc = jnp.asarray(b_depth), jnp.asarray(b_color)

        def fake_get_samples(key, H0, H1, W0, W1, nn, fx, fy, cx, cy, c2w,
                             depth, color):
            ro, rd = rays_from_uv(ii, jj, c2w, fx, fy, cx, cy)
            return ro, rd, bd, bc

        monkeypatch.setattr(tracker_mod, "get_samples", fake_get_samples)
        cfg = tracker_mod.TrackerConfig(
            pixels=n, handle_dynamic=True, use_color=True,
            w_color_loss=w_color_loss, ignore_edge_w=8, ignore_edge_h=8,
        )
        cam = Camera(H, W, FX, FY, CX, CY)

        def loss_fn(ct):
            return tracker_mod._tracking_loss(
                ct, decoders, grids, None, jnp.asarray(BOUND, jnp.float32),
                jax.random.PRNGKey(0),
                jnp.zeros((H, W, 3)), jnp.zeros((H, W)),
                None, None, None, None,
                cfg, cam, _settings(), rgbd=True, event=False,
            )

        (total, aux), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            jnp.asarray(CAM7)
        )
        np.testing.assert_allclose(
            float(total), float(loss_ref.detach()), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(grad), grad_ref, rtol=2e-3, atol=2e-3 * np.abs(grad_ref).max()
        )


class TestEventLossParity:
    """The event-loss chain against the ACTUAL reference code
    (src/Tracker.py:129-157, 204-233): NEAREST resizes of gt_event / gt_mask /
    pre_gt_color, render_img_rescale, the real UNet_2heads inference, L2 +
    gaussian-blur pyramid with the ``unblurred_weight`` quirk (it scales only
    the LOGGED entry — the optimized loss keeps the raw L2 at weight 1),
    balancer, and the mask cross-entropy that is computed but never
    backpropagated. Round-4 verdict Missing #1: this was the one reference
    path not pinned component-level. (Caveat, inherited from the E2E
    comparison: torchvision is absent here, so the reference side's Resize /
    gaussian_blur come from utils/refbridge's torch reimplementations of the
    documented torchvision semantics.)"""

    SCALE = 0.5  # 48x48 -> 24x24: >= 16 px through the UNet's 4 downsamples
    BALANCER = 0.025
    KSIZES = [9]
    KWEIGHTS = [1.0]

    def _event_fixture(self, rng):
        gt_event = rng.uniform(0, 3, size=(H, W, 2)).astype(np.float32)
        gt_event[rng.uniform(size=(H, W)) < 0.6] = 0.0  # sparse, like ESIM
        gt_mask = np.any(gt_event != 0, axis=-1).astype(np.float32)
        prev_color = rng.uniform(0, 1, size=(H, W, 3)).astype(np.float32)
        gt_depth = rng.uniform(0.5, 1.2, size=(H, W)).astype(np.float32)
        return gt_event, gt_mask, prev_color, gt_depth

    def _ref_pyramid_loss(self, gt_event_lo_t, full_event_t,
                          unblurred_weight=0.0):
        """The reference's exact loss construction (src/Tracker.py:204-220)."""
        from torchvision import transforms  # refbridge shim

        loss_event = ((gt_event_lo_t - full_event_t) ** 2).sum()
        losses_event_list = [unblurred_weight * loss_event]  # logging only
        for ks, kw in zip(self.KSIZES, self.KWEIGHTS):
            g = transforms.functional.gaussian_blur(
                gt_event_lo_t.permute(2, 0, 1), kernel_size=ks
            ).permute(1, 2, 0)
            p = transforms.functional.gaussian_blur(
                full_event_t.permute(2, 0, 1), kernel_size=ks
            ).permute(1, 2, 0)
            loss_event = loss_event + kw * ((g - p) ** 2).sum()
            losses_event_list.append(float((g - p).detach().pow(2).sum()))
        return loss_event * self.BALANCER

    def test_resize_pyramid_balancer_injected_pred(self):
        """Injected (gt_event, predicted event) pair through resize + blur
        pyramid + balancer: loss and gradient wrt the prediction. Isolates
        the loss algebra from renderer/net numerics."""
        from torchvision import transforms  # refbridge shim

        from evennicer_slam_tpu.ops.resize import resize_nearest
        from evennicer_slam_tpu.slam.tracker import event_pyramid_loss

        rng = np.random.default_rng(21)
        gt_event, _, _, _ = self._event_fixture(rng)
        h_new, w_new = int(self.SCALE * H), int(self.SCALE * W)
        pred = rng.uniform(0, 2, size=(h_new, w_new, 2)).astype(np.float32)

        # reference: NEAREST resize (src/Tracker.py:130-140) then the loss
        tfm = transforms.Resize(
            (h_new, w_new),
            interpolation=transforms.InterpolationMode.NEAREST,
        )
        gt_lo_t = tfm(
            torch.from_numpy(gt_event).permute(2, 0, 1)
        ).permute(1, 2, 0)
        pred_t = torch.from_numpy(pred.copy()).requires_grad_(True)
        loss_ref = self._ref_pyramid_loss(gt_lo_t, pred_t)
        loss_ref.backward()

        def loss_fn(p):
            gt_lo = resize_nearest(jnp.asarray(gt_event), (h_new, w_new))
            return event_pyramid_loss(
                gt_lo, p, tuple(self.KSIZES), tuple(self.KWEIGHTS)
            ) * self.BALANCER

        loss, grad = jax.value_and_grad(loss_fn)(jnp.asarray(pred))
        np.testing.assert_allclose(float(loss), float(loss_ref.detach()),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(grad), pred_t.grad.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_unblurred_weight_quirk(self):
        """unblurred_weight does NOT scale the optimized loss — the raw L2
        rides at weight 1 regardless (src/Tracker.py:210 only seeds the
        logging list with it). Pin that the reference loss is invariant to it
        and equals the repo loss, which has no such knob by design."""
        from evennicer_slam_tpu.slam.tracker import event_pyramid_loss

        rng = np.random.default_rng(22)
        h_new, w_new = int(self.SCALE * H), int(self.SCALE * W)
        gt = rng.uniform(0, 2, size=(h_new, w_new, 2)).astype(np.float32)
        pred = rng.uniform(0, 2, size=(h_new, w_new, 2)).astype(np.float32)
        l0 = self._ref_pyramid_loss(torch.from_numpy(gt),
                                    torch.from_numpy(pred),
                                    unblurred_weight=0.0)
        l7 = self._ref_pyramid_loss(torch.from_numpy(gt),
                                    torch.from_numpy(pred),
                                    unblurred_weight=7.0)
        assert float(l0) == float(l7)
        ours = event_pyramid_loss(
            jnp.asarray(gt), jnp.asarray(pred),
            tuple(self.KSIZES), tuple(self.KWEIGHTS),
        ) * self.BALANCER
        np.testing.assert_allclose(float(ours), float(l0), rtol=1e-5)

    def test_event_loss_and_pose_gradient(self, nice_pair, tmp_path):
        """The FULL event branch at a fixed pose: render_img_rescale through
        the real renderer + the real UNet_2heads + the pyramid loss — loss,
        mask-CE metric, AND the pose gradient, reference vs repo on identical
        inputs and converted weights (the event-mode analogue of
        test_rgbd_loss_and_pose_gradient)."""
        from torchvision import transforms  # refbridge shim

        from src.event_net import inference_event as ref_inference_event

        from evennicer_slam_tpu.ops.resize import resize_bilinear, resize_nearest
        from evennicer_slam_tpu.slam import tracker as tracker_mod
        from evennicer_slam_tpu.slam.camera import Camera

        nice, decoders, grids, c_torch = nice_pair
        rng = np.random.default_rng(23)
        gt_event, gt_mask, prev_color, gt_depth = self._event_fixture(rng)
        h_new, w_new = int(self.SCALE * H), int(self.SCALE * W)

        # real reference UNet with randomized (He-scaled) weights + BN stats
        import sys

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from event_net.unet_model import UNet_2heads

        from test_eventnet import make_torch_state

        net = UNet_2heads(6, 2, 2).eval()
        state = make_torch_state(rng)
        for k, v in state.items():
            if v.ndim == 4:
                fan_in = v.shape[1] * v.shape[2] * v.shape[3]
                state[k] = torch.from_numpy(
                    rng.normal(size=tuple(v.shape), scale=np.sqrt(2.0 / fan_in))
                    .astype(np.float32)
                )
        net.load_state_dict(state)
        path = str(tmp_path / "evnet.pth")
        torch.save(net.state_dict(), path)
        from evennicer_slam_tpu.models.eventnet import load_eventnet_torch

        evnet_params = load_eventnet_torch(path)

        # ---- reference computation (src/Tracker.py:129-157, 204-233) ----
        tfm = transforms.Resize(
            (h_new, w_new),
            interpolation=transforms.InterpolationMode.NEAREST,
        )
        gt_event_lo_t = tfm(
            torch.from_numpy(gt_event).permute(2, 0, 1)
        ).permute(1, 2, 0)
        # dataset mask is LONG: torch.any(event != 0) * 1
        # (src/utils/datasets.py:211-212) — so the reference CE below runs in
        # index-target mode over classes {0, 1}
        gt_mask_lo_t = tfm(
            torch.from_numpy(gt_mask.astype(np.int64))[None]
        ).permute(1, 2, 0)
        prev_lo_t = tfm(
            torch.from_numpy(prev_color).permute(2, 0, 1)
        ).permute(1, 2, 0)

        cam_t = torch.tensor(CAM7, requires_grad=True)
        c2w_t = ref_common.get_camera_from_tensor(cam_t)
        renderer = _ref_renderer(nice=True, occupancy=True)
        _, _, cur_lo_t = renderer.render_img_rescale(
            c_torch, nice, c2w_t, "cpu", stage="color",
            gt_depth=torch.from_numpy(gt_depth), scale_factor=self.SCALE,
        )
        full_event_t, event_mask_t = ref_inference_event(
            net=net, img1=prev_lo_t, img2=cur_lo_t, device="cpu",
            scale_factor=1.0, out_threshold=0.5,
        )
        loss_ref = self._ref_pyramid_loss(gt_event_lo_t, full_event_t)
        # mask CE: computed + logged, never backpropagated
        # (src/Tracker.py:222-224)
        criterion_ce = torch.nn.CrossEntropyLoss()
        loss_mask_ref = criterion_ce(
            event_mask_t, gt_mask_lo_t.permute(2, 0, 1)
        )
        loss_ref.backward()
        grad_ref = cam_t.grad.numpy().copy()

        # ---- repo computation: the tracker's own resize chain + event
        # branch of _tracking_loss on identical inputs ----
        gt_event_lo = resize_nearest(jnp.asarray(gt_event), (h_new, w_new))
        prev_lo = resize_nearest(jnp.asarray(prev_color), (h_new, w_new))
        gt_depth_lo_flat = resize_bilinear(
            jnp.asarray(gt_depth), (h_new, w_new)
        ).reshape(-1)
        gt_mask_lo = resize_nearest(jnp.asarray(gt_mask), (h_new, w_new))
        np.testing.assert_allclose(
            np.asarray(gt_event_lo), gt_event_lo_t.numpy(), atol=0,
        )  # NEAREST resizes must agree bitwise before the loss comparison
        np.testing.assert_allclose(
            np.asarray(prev_lo), prev_lo_t.numpy(), atol=0,
        )

        cfg = tracker_mod.TrackerConfig(
            use_events=True, activate_events=True, balancer=self.BALANCER,
            scale_factor=self.SCALE, blur=True,
            kernel_sizes=tuple(self.KSIZES),
            kernel_weights=tuple(self.KWEIGHTS), predictor="unet",
        )
        cam = Camera(H, W, FX, FY, CX, CY)

        def loss_fn(ct):
            return tracker_mod._tracking_loss(
                ct, decoders, grids, evnet_params,
                jnp.asarray(BOUND, jnp.float32), jax.random.PRNGKey(0),
                jnp.zeros((H, W, 3)), jnp.zeros((H, W)),
                gt_event_lo, prev_lo, gt_depth_lo_flat, gt_mask_lo,
                cfg, cam, _settings(), rgbd=False, event=True,
            )

        (total, aux), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            jnp.asarray(CAM7)
        )
        np.testing.assert_allclose(
            float(total), float(loss_ref.detach()), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(aux["event"]), float(loss_ref.detach()), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(aux["mask"]), float(loss_mask_ref.detach()), rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(grad), grad_ref,
            rtol=5e-3, atol=5e-3 * np.abs(grad_ref).max(),
        )

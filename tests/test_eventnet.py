"""EventNet tests: forward shapes, inference semantics, torch converter."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from evennicer_slam_tpu.models.eventnet import (
    eventnet_forward,
    inference_event,
    init_eventnet,
    load_eventnet_torch,
)


class TestEventNetForward:
    def test_shapes(self):
        params = init_eventnet(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 32, 48, 6))
        events, mask = eventnet_forward(params, x)
        assert events.shape == (1, 32, 48, 2)
        assert mask.shape == (1, 32, 48, 2)
        assert float(mask.min()) >= 0.0 and float(mask.max()) <= 1.0

    def test_odd_sizes_pad_correctly(self):
        # reference pads up-sampled maps to match skips (unet_parts.py:56-67)
        params = init_eventnet(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 50, 35, 6))
        events, mask = eventnet_forward(params, x)
        assert events.shape == (1, 50, 35, 2)

    def test_inference_multiplies_mask(self):
        params = init_eventnet(jax.random.PRNGKey(1))
        img1 = jax.random.uniform(jax.random.PRNGKey(2), (32, 48, 3))
        img2 = jax.random.uniform(jax.random.PRNGKey(3), (32, 48, 3))
        pred, mask = inference_event(params, img1, img2)
        events, m = eventnet_forward(
            params, jnp.concatenate([img1, img2], -1)[None]
        )
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray((events * m[..., 1:2])[0]), atol=1e-6
        )


def make_torch_state(rng):
    """Random torch state_dict keyed exactly like the reference UNet_2heads."""
    state = {}

    def dconv(prefix, cin, mid, cout):
        state[f"{prefix}.double_conv.0.weight"] = torch.from_numpy(
            rng.normal(size=(mid, cin, 3, 3), scale=0.1).astype(np.float32))
        state[f"{prefix}.double_conv.1.weight"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, size=(mid,)).astype(np.float32))
        state[f"{prefix}.double_conv.1.bias"] = torch.from_numpy(
            rng.normal(size=(mid,), scale=0.1).astype(np.float32))
        state[f"{prefix}.double_conv.1.running_mean"] = torch.from_numpy(
            rng.normal(size=(mid,), scale=0.1).astype(np.float32))
        state[f"{prefix}.double_conv.1.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, size=(mid,)).astype(np.float32))
        state[f"{prefix}.double_conv.3.weight"] = torch.from_numpy(
            rng.normal(size=(cout, mid, 3, 3), scale=0.1).astype(np.float32))
        state[f"{prefix}.double_conv.4.weight"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, size=(cout,)).astype(np.float32))
        state[f"{prefix}.double_conv.4.bias"] = torch.from_numpy(
            rng.normal(size=(cout,), scale=0.1).astype(np.float32))
        state[f"{prefix}.double_conv.4.running_mean"] = torch.from_numpy(
            rng.normal(size=(cout,), scale=0.1).astype(np.float32))
        state[f"{prefix}.double_conv.4.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, size=(cout,)).astype(np.float32))

    dconv("inc", 6, 64, 64)
    downs = [(64, 128, 128), (128, 256, 256), (256, 512, 512), (512, 512, 512)]
    for i, (cin, mid, cout) in enumerate(downs, start=1):
        dconv(f"down{i}.maxpool_conv.1", cin, mid, cout)
    ups = [(1024, 512, 256), (512, 256, 128), (256, 128, 64), (128, 64, 64)]
    for head in ("1", "2"):
        for i, (cin, mid, cout) in enumerate(ups, start=1):
            dconv(f"up{i}_{head}.conv", cin, mid, cout)
        state[f"outc_{head}.conv.weight"] = torch.from_numpy(
            rng.normal(size=(2, 64, 1, 1), scale=0.1).astype(np.float32))
        state[f"outc_{head}.conv.bias"] = torch.from_numpy(
            rng.normal(size=(2,), scale=0.1).astype(np.float32))
    return state


class TestConverter:
    def test_load_and_run(self, tmp_path, rng):
        state = make_torch_state(rng)
        path = str(tmp_path / "eventnet.pth")
        torch.save(state, path)
        params = load_eventnet_torch(path)
        x = jnp.asarray(rng.uniform(size=(1, 32, 48, 6)).astype(np.float32))
        events, mask = eventnet_forward(params, x)
        assert events.shape == (1, 32, 48, 2)
        assert np.isfinite(np.asarray(events)).all()

    def test_first_block_matches_torch(self, tmp_path, rng):
        """DoubleConv #1 output parity against torch conv+BN (inference)."""
        state = make_torch_state(rng)
        path = str(tmp_path / "eventnet.pth")
        torch.save(state, path)
        params = load_eventnet_torch(path)

        x = rng.uniform(size=(1, 16, 16, 6)).astype(np.float32)
        from evennicer_slam_tpu.models.eventnet import _double_conv

        ours = np.asarray(_double_conv(jnp.asarray(x), params["inc"]))

        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        w1 = state["inc.double_conv.0.weight"]
        h = torch.nn.functional.conv2d(t, w1, padding=1)
        h = torch.nn.functional.batch_norm(
            h, state["inc.double_conv.1.running_mean"],
            state["inc.double_conv.1.running_var"],
            state["inc.double_conv.1.weight"], state["inc.double_conv.1.bias"],
            training=False,
        ).relu()
        h = torch.nn.functional.conv2d(h, state["inc.double_conv.3.weight"], padding=1)
        h = torch.nn.functional.batch_norm(
            h, state["inc.double_conv.4.running_mean"],
            state["inc.double_conv.4.running_var"],
            state["inc.double_conv.4.weight"], state["inc.double_conv.4.bias"],
            training=False,
        ).relu()
        theirs = h.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class TestEventNetTraining:
    def test_loss_decreases(self):
        import jax
        import jax.numpy as jnp
        from evennicer_slam_tpu.models.eventnet_train import (
            _loss_fn, make_pair_batch, train_eventnet,
        )
        from evennicer_slam_tpu.models.eventnet import init_eventnet

        rng = np.random.default_rng(0)
        bound = np.array([[-1.2, 1.2], [-1.0, 1.0], [-0.8, 0.8]], np.float32)
        i1, i2, ev = make_pair_batch(rng, 2, (16, 24), bound)
        assert ev.shape == (2, 16, 24, 2)
        p0 = init_eventnet(jax.random.PRNGKey(0))
        l0, _ = _loss_fn(p0, jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(ev))
        params = train_eventnet(steps=6, batch=2, hw=(16, 24), lr=1e-3, seed=0)
        l1, _ = _loss_fn(params, jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(ev))
        assert float(l1) < float(l0)

    def test_npz_roundtrip(self, tmp_path):
        import jax
        from evennicer_slam_tpu.models.eventnet import init_eventnet
        from evennicer_slam_tpu.models.eventnet_train import (
            load_eventnet_npz, save_eventnet_npz,
        )

        params = init_eventnet(jax.random.PRNGKey(3))
        a = np.asarray(params["inc"]["w1"])
        # default storage is f16-quantized (halves the shipped-weights blob);
        # loader casts back to f32 with ~2^-11 relative quantization
        p = str(tmp_path / "e.npz")
        save_eventnet_npz(params, p)
        back = load_eventnet_npz(p)
        b = np.asarray(back["inc"]["w1"])
        assert b.dtype == np.float32
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)
        # BN running stats must survive quantization in f32: variances can
        # underflow f16's 6.1e-5 normal floor (rsqrt(v+eps) would then
        # inflate activations); stats roundtrip bitwise, weights are f16
        raw = dict(np.load(p))
        for k, v in raw.items():
            leaf = k.rsplit(".", 2)
            is_bn_stat = (len(leaf) == 3 and leaf[1].startswith("bn")
                          and leaf[2] in ("m", "v"))
            assert v.dtype == (np.float32 if is_bn_stat else np.float16), k
        tiny = jax.tree_util.tree_map(lambda x: x, params)
        tiny["inc"]["bn1"]["v"] = jnp.full_like(tiny["inc"]["bn1"]["v"], 1e-6)
        pt = str(tmp_path / "tinyvar.npz")
        save_eventnet_npz(tiny, pt)
        back_t = load_eventnet_npz(pt)
        np.testing.assert_allclose(
            np.asarray(back_t["inc"]["bn1"]["v"]), np.float32(1e-6),
            rtol=0, atol=0)
        # half=False roundtrips exactly
        p32 = str(tmp_path / "e32.npz")
        save_eventnet_npz(params, p32, half=False)
        exact = load_eventnet_npz(p32)
        np.testing.assert_allclose(a, np.asarray(exact["inc"]["w1"]), atol=0)


class TestFullForwardParityVsReference:
    """Whole UNet_2heads forward parity against the actual reference torch
    module (/root/reference/event_net/unet_model.py:72-123, imported as the
    golden — bilinear align_corners=True upsampling, pad-to-skip, skip-concat
    order, both heads, sigmoid mask) to 1e-4."""

    def _nets(self, tmp_path, rng):
        import sys

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from event_net.unet_model import UNet_2heads

        net = UNet_2heads(6, 2, 2).eval()
        # randomized weights AND BatchNorm running stats (not the trivial
        # mean=0/var=1 defaults) so the normalization path is exercised;
        # conv weights are He-scaled so activations stay O(1) through the
        # 18-conv net — make_torch_state's 0.1-std weights amplify ~10x per
        # layer and would drown the 1e-4 comparison in f32 reduction noise
        state = make_torch_state(rng)
        for k, v in state.items():
            if v.ndim == 4:
                fan_in = v.shape[1] * v.shape[2] * v.shape[3]
                state[k] = torch.from_numpy(
                    rng.normal(size=tuple(v.shape), scale=np.sqrt(2.0 / fan_in))
                    .astype(np.float32)
                )
        net.load_state_dict(state)
        path = str(tmp_path / "ref_eventnet.pth")
        torch.save(net.state_dict(), path)
        return net, load_eventnet_torch(path)

    def test_full_forward_matches(self, tmp_path, rng):
        net, params = self._nets(tmp_path, rng)
        # odd spatial size stresses the pad-to-skip alignment after each
        # bilinear upsample (unet_parts.py:56-67)
        x = rng.uniform(size=(1, 45, 30, 6)).astype(np.float32)
        with torch.no_grad():
            ev_t, mask_t = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ev_j, mask_j = eventnet_forward(params, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(ev_j), ev_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(mask_j), mask_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )

    def test_inference_event_matches(self, tmp_path, rng):
        """events x mask-prob inference parity (reference
        src/event_net.py:89-99 slices channel 1 of the sigmoid mask)."""
        net, params = self._nets(tmp_path, rng)
        img1 = rng.uniform(size=(32, 48, 3)).astype(np.float32)
        img2 = rng.uniform(size=(32, 48, 3)).astype(np.float32)
        with torch.no_grad():
            pair = np.concatenate([img1, img2], -1).transpose(2, 0, 1)[None]
            ev_t, mask_t = net(torch.from_numpy(pair))
            golden = (ev_t * mask_t[:, 1:2]).numpy()[0].transpose(1, 2, 0)
        pred, _ = inference_event(params, jnp.asarray(img1), jnp.asarray(img2))
        np.testing.assert_allclose(np.asarray(pred), golden, rtol=1e-4, atol=1e-4)


class TestPredictEventCLI:
    def test_predict_event_tool(self, tmp_path, monkeypatch):
        """Standalone prediction CLI (reference src/event_net.py:101-173):
        .npz model + two images in -> event + binary mask PNGs out."""
        import cv2
        import sys

        from evennicer_slam_tpu.models.eventnet import init_eventnet
        from evennicer_slam_tpu.models.eventnet_train import save_eventnet_npz
        from evennicer_slam_tpu.tools import predict_event

        model_path = str(tmp_path / "net.npz")
        save_eventnet_npz(init_eventnet(jax.random.PRNGKey(0)), model_path)
        rng = np.random.default_rng(0)
        p1 = str(tmp_path / "a.png")
        p2 = str(tmp_path / "b.png")
        cv2.imwrite(p1, (rng.uniform(size=(64, 96, 3)) * 255).astype(np.uint8))
        cv2.imwrite(p2, (rng.uniform(size=(64, 96, 3)) * 255).astype(np.uint8))
        ev_out = str(tmp_path / "ev.png")
        bin_out = str(tmp_path / "bin.png")
        monkeypatch.setattr(sys, "argv", [
            "predict_event", "--model", model_path, "-img1", p1, "-img2", p2,
            "--event", ev_out, "--binary", bin_out, "--scale", "0.5",
        ])
        predict_event.main()
        ev = cv2.imread(ev_out)
        bi = cv2.imread(bin_out, cv2.IMREAD_GRAYSCALE)
        assert ev is not None and ev.shape == (32, 48, 3)
        assert bi is not None and bi.shape == (32, 48)

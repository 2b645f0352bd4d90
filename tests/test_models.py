"""Decoder / grid / converter tests.

The torch golden here is a minimal functional re-computation of the reference
decoder equations (reference src/conv_onet/models/decoder.py:91-343) driven
directly off a state_dict, used to verify both the torch->JAX weight
converter and the JAX forward."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from evennicer_slam_tpu.models.decoders import (
    _mlp_forward,
    init_imap_decoder,
    init_nice_decoders,
    nice_forward,
)
from evennicer_slam_tpu.models.grids import grid_shapes, init_grids
from evennicer_slam_tpu.models.pretrained import _mlp_from_torch

BOUND = np.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]], np.float32)


def random_torch_mlp_state(rng, emb=93, c_dim=32, hidden=32, n_blocks=5,
                           skips=(2,), out_dim=1):
    """Random weights keyed exactly like the reference torch module."""
    state = {}
    state["embedder._B"] = rng.normal(size=(3, emb)).astype(np.float32) * 25
    in_dim = emb
    for i in range(n_blocks):
        state[f"pts_linears.{i}.weight"] = rng.normal(
            size=(hidden, in_dim), scale=0.3
        ).astype(np.float32)
        state[f"pts_linears.{i}.bias"] = rng.normal(size=(hidden,), scale=0.1).astype(np.float32)
        in_dim = hidden + emb if i in skips else hidden
    if c_dim:
        for i in range(n_blocks):
            state[f"fc_c.{i}.weight"] = rng.normal(size=(hidden, c_dim), scale=0.3).astype(np.float32)
            state[f"fc_c.{i}.bias"] = rng.normal(size=(hidden,), scale=0.1).astype(np.float32)
    state["output_linear.weight"] = rng.normal(size=(out_dim, in_dim), scale=0.3).astype(np.float32)
    state["output_linear.bias"] = rng.normal(size=(out_dim,), scale=0.1).astype(np.float32)
    return state


def torch_mlp_forward(state, p, feat, skips=(2,)):
    """Reference MLP.forward equations (decoder.py:177-203), functional."""
    t = lambda k: torch.from_numpy(state[k])
    emb = torch.sin(p @ t("embedder._B"))
    h = emb
    i = 0
    while f"pts_linears.{i}.weight" in state:
        h = F.relu(F.linear(h, t(f"pts_linears.{i}.weight"), t(f"pts_linears.{i}.bias")))
        if feat is not None:
            h = h + F.linear(feat, t(f"fc_c.{i}.weight"), t(f"fc_c.{i}.bias"))
        if i in skips:
            h = torch.cat([emb, h], -1)
        i += 1
    out = F.linear(h, t("output_linear.weight"), t("output_linear.bias"))
    return out


class TestConverterParity:
    def test_mlp_with_features(self, rng):
        state = random_torch_mlp_state(rng)
        params = _mlp_from_torch(state)
        p = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        feat = rng.normal(size=(50, 32)).astype(np.float32)
        ours = np.asarray(_mlp_forward(params, jnp.asarray(p), jnp.asarray(feat)))
        theirs = torch_mlp_forward(state, torch.from_numpy(p), torch.from_numpy(feat))
        np.testing.assert_allclose(ours, theirs.numpy()[:, 0], rtol=1e-4, atol=1e-4)

    def test_mlp_color_head(self, rng):
        state = random_torch_mlp_state(rng, out_dim=4)
        params = _mlp_from_torch(state)
        p = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
        feat = rng.normal(size=(20, 32)).astype(np.float32)
        ours = np.asarray(_mlp_forward(params, jnp.asarray(p), jnp.asarray(feat)))
        theirs = torch_mlp_forward(state, torch.from_numpy(p), torch.from_numpy(feat))
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-4)

    def test_imap_shape(self, rng):
        state = random_torch_mlp_state(rng, c_dim=0, hidden=256, n_blocks=4,
                                       skips=(), out_dim=4)
        params = _mlp_from_torch(state)
        p = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
        ours = np.asarray(_mlp_forward(params, jnp.asarray(p), None))
        theirs = torch_mlp_forward(state, torch.from_numpy(p), None, skips=())
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-4)


class TestPretrainedCheckpointLoading:
    """End-to-end ConvONet checkpoint consumption: a .pt file keyed exactly
    as the reference's pretrained middle_fine.pt / coarse.pt (the key-prefix
    surgery contract of src/EvenNICER_SLAM.py:184-215) loads through
    load_pretrained_decoders and reproduces the torch forward. The real
    checkpoints are not redistributable; this pins the loader against the
    on-disk FORMAT so a real file drops in unchanged."""

    def test_middle_fine_and_coarse_checkpoints(self, rng, tmp_path):
        from evennicer_slam_tpu.models.decoders import (
            _mlp_no_xyz_forward,
            init_nice_decoders,
        )
        from evennicer_slam_tpu.models.pretrained import (
            load_pretrained_decoders,
        )

        mid_state = random_torch_mlp_state(rng, c_dim=32)
        fine_state = random_torch_mlp_state(rng, c_dim=64)  # concat_feature
        model = {}
        for k, v in mid_state.items():
            model["decoder.coarse_" + k] = torch.from_numpy(v)
        for k, v in fine_state.items():
            model["decoder.fine_" + k] = torch.from_numpy(v)
        # encoder entries must be ignored by the surgery
        # ('decoder' in key and 'encoder' not in key, EvenNICER_SLAM.py:196)
        model["encoder.conv.weight"] = torch.zeros(3, 3)
        mf_path = str(tmp_path / "middle_fine.pt")
        torch.save({"model": model}, mf_path)

        # coarse.pt: MLP_no_xyz (no embedder/fc_c; lin0 input = hidden)
        c_state = {}
        in_dim = 32
        for i in range(5):
            c_state[f"pts_linears.{i}.weight"] = rng.normal(
                size=(32, in_dim), scale=0.3).astype(np.float32)
            c_state[f"pts_linears.{i}.bias"] = rng.normal(
                size=(32,), scale=0.1).astype(np.float32)
            in_dim = 32 + 32 if i == 2 else 32
        c_state["output_linear.weight"] = rng.normal(
            size=(1, in_dim), scale=0.3).astype(np.float32)
        c_state["output_linear.bias"] = rng.normal(
            size=(1,), scale=0.1).astype(np.float32)
        c_path = str(tmp_path / "coarse.pt")
        torch.save(
            {"model": {"decoder." + k: torch.from_numpy(v)
                       for k, v in c_state.items()}},
            c_path,
        )

        decoders = init_nice_decoders(jax.random.PRNGKey(0), coarse=True)
        loaded = load_pretrained_decoders(decoders, mf_path, c_path)

        p = rng.uniform(-1, 1, size=(23, 3)).astype(np.float32)
        feat32 = rng.normal(size=(23, 32)).astype(np.float32)
        feat64 = rng.normal(size=(23, 64)).astype(np.float32)

        ours_mid = np.asarray(
            _mlp_forward(loaded["middle"], jnp.asarray(p), jnp.asarray(feat32)))
        ref_mid = torch_mlp_forward(
            mid_state, torch.from_numpy(p), torch.from_numpy(feat32))
        np.testing.assert_allclose(ours_mid, ref_mid.numpy()[:, 0],
                                   rtol=1e-4, atol=1e-4)

        ours_fine = np.asarray(
            _mlp_forward(loaded["fine"], jnp.asarray(p), jnp.asarray(feat64)))
        ref_fine = torch_mlp_forward(
            fine_state, torch.from_numpy(p), torch.from_numpy(feat64))
        np.testing.assert_allclose(ours_fine, ref_fine.numpy()[:, 0],
                                   rtol=1e-4, atol=1e-4)

        out_c = np.asarray(
            _mlp_no_xyz_forward(loaded["coarse"], jnp.asarray(feat32)))
        assert out_c.shape == (23,) and np.isfinite(out_c).all()
        # color decoder untouched by the surgery
        np.testing.assert_array_equal(
            np.asarray(loaded["color"]["out_w"]),
            np.asarray(decoders["color"]["out_w"]))


class TestNICE:
    def setup_method(self, method):
        key = jax.random.PRNGKey(0)
        self.decoders = init_nice_decoders(key, coarse=True)
        self.grids = init_grids(
            jax.random.PRNGKey(1), BOUND,
            {"coarse": 0.8, "middle": 0.4, "fine": 0.2, "color": 0.2},
            c_dim=32, coarse=True,
        )
        self.bound = jnp.asarray(BOUND)

    def test_stage_shapes(self):
        p = jax.random.uniform(jax.random.PRNGKey(2), (17, 3), minval=-0.9, maxval=0.9)
        for stage in ["coarse", "middle", "fine", "color"]:
            raw = nice_forward(self.decoders, self.grids, p, self.bound, stage)
            assert raw.shape == (17, 4)

    def test_fine_is_fine_plus_middle(self):
        p = jax.random.uniform(jax.random.PRNGKey(3), (9, 3), minval=-0.9, maxval=0.9)
        occ_m = nice_forward(self.decoders, self.grids, p, self.bound, "middle")[:, 3]
        occ_f = nice_forward(self.decoders, self.grids, p, self.bound, "fine")[:, 3]
        occ_c = nice_forward(self.decoders, self.grids, p, self.bound, "color")[:, 3]
        # color stage occupancy equals fine stage occupancy
        np.testing.assert_allclose(np.asarray(occ_f), np.asarray(occ_c), atol=1e-6)
        # and includes the middle component
        assert not np.allclose(np.asarray(occ_f), np.asarray(occ_m))

    def test_middle_stage_grad_only_touches_middle(self):
        p = jax.random.uniform(jax.random.PRNGKey(4), (9, 3), minval=-0.5, maxval=0.5)

        def loss(grids):
            return jnp.sum(nice_forward(self.decoders, grids, p, self.bound, "middle")[:, 3])

        g = jax.grad(loss)(self.grids)
        assert np.any(np.asarray(g["middle"]) != 0)
        assert np.all(np.asarray(g["fine"]) == 0)
        assert np.all(np.asarray(g["color"]) == 0)

    def test_fine_concat_stops_middle_grid_gradient_via_fine_path(self):
        p = jax.random.uniform(jax.random.PRNGKey(5), (9, 3), minval=-0.5, maxval=0.5)

        # the fine decoder's middle-feature concat is stop_gradient'ed
        # (reference decoder.py:183-187); middle grid still gets gradient via
        # the separately-added middle_occ term.
        def fine_only(grids):
            middle_feat = None
            from evennicer_slam_tpu.models.decoders import _grid_feat, _mlp_forward
            mf = _grid_feat(grids, "middle", p, self.bound)
            ff = jnp.concatenate(
                [_grid_feat(grids, "fine", p, self.bound), jax.lax.stop_gradient(mf)],
                axis=-1,
            )
            return jnp.sum(_mlp_forward(self.decoders["fine"], p, ff))

        g = jax.grad(fine_only)(self.grids)
        assert np.all(np.asarray(g["middle"]) == 0)
        assert np.any(np.asarray(g["fine"]) != 0)


class TestGrids:
    def test_shapes_match_reference_formula(self):
        bound = np.array([[-2.9, 9.1], [-3.2, 5.76], [-3.5, 3.54]], np.float32)
        glen = {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16}
        shapes = grid_shapes(bound, glen, coarse=True, coarse_bound_enlarge=2)
        xyz = bound[:, 1] - bound[:, 0]
        # reference: int(extent/len) per axis (x,y,z), stored (z,y,x)
        assert shapes["middle"] == (int(xyz[2] / 0.32), int(xyz[1] / 0.32), int(xyz[0] / 0.32))
        assert shapes["coarse"] == (
            int(xyz[2] * 2 / 2.0), int(xyz[1] * 2 / 2.0), int(xyz[0] * 2 / 2.0)
        )

    def test_init_std(self):
        grids = init_grids(
            jax.random.PRNGKey(0),
            np.array([[-4, 4], [-4, 4], [-4, 4]], np.float32),
            {"coarse": 1.0, "middle": 0.5, "fine": 0.25, "color": 0.25},
            c_dim=32, coarse=True,
        )
        assert abs(float(jnp.std(grids["middle"])) - 0.01) < 2e-3
        assert abs(float(jnp.std(grids["fine"])) - 0.0001) < 2e-5


class TestPosEmbeddingVariants:
    """pos_embedding_method = fourier|same|nerf|fc_relu
    (reference decoder.py:128-152); unknown values must raise."""

    def _fwd(self, method, name="middle"):
        from evennicer_slam_tpu.models.decoders import _init_mlp

        params = _init_mlp(jax.random.PRNGKey(0), 0, 32, 5, (2,), False, False,
                           pos_embedding_method=method, name=name)
        p = jax.random.uniform(jax.random.PRNGKey(1), (17, 3), minval=-1, maxval=1)
        return params, p, _mlp_forward(params, p, None)

    def test_all_variants_run(self):
        for method in ("fourier", "same", "nerf", "fc_relu"):
            _, _, out = self._fwd(method)
            assert out.shape == (17,) and np.isfinite(np.asarray(out)).all()

    def test_unknown_method_raises(self):
        import pytest

        with pytest.raises(ValueError, match="pos_embedding_method"):
            self._fwd("bogus")

    def test_nerf_embedding_matches_reference_formula(self):
        """[x, sin(x f), cos(x f)] per freq; color uses 10 log-sampled bands,
        others 5 linear bands (decoder.py:49-66,137-147)."""
        from evennicer_slam_tpu.models.decoders import _init_mlp

        for name, multires, log in (("middle", 5, False), ("color", 10, True)):
            params = _init_mlp(jax.random.PRNGKey(0), 0, 32, 5, (2,), False,
                               False, pos_embedding_method="nerf", name=name)
            freqs = np.asarray(params["nerf_freqs"])
            assert freqs.shape == (multires,)
            if log:
                expect = 2.0 ** np.linspace(0.0, multires - 1, multires)
            else:
                expect = np.linspace(1.0, 2.0 ** (multires - 1), multires)
            np.testing.assert_allclose(freqs, expect, rtol=1e-6)
            # first layer consumes 3 + 6*multires inputs
            assert params["lin_w"][0].shape[0] == 3 + 6 * multires

            # golden: torch evaluation of the same formula
            x = torch.from_numpy(
                np.random.default_rng(0).uniform(-1, 1, (7, 3)).astype(np.float32)
            )
            outs = [x]
            for f in expect:
                outs += [torch.sin(x * f), torch.cos(x * f)]
            golden = torch.cat(outs, -1).numpy()

            xj = jnp.asarray(x.numpy())
            xf = xj[..., None, :] * params["nerf_freqs"][:, None]
            sc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
            ours = np.asarray(
                jnp.concatenate([xj, sc.reshape(7, -1)], axis=-1)
            )
            np.testing.assert_allclose(ours, golden, atol=1e-6)

    def test_fc_relu_is_linear_embedding(self):
        params, p, out = self._fwd("fc_relu")
        assert params["emb_w"].shape == (3, 93)
        # embedder output can be negative (no relu applied, decoder.py:149-151)
        emb = np.asarray(p @ params["emb_w"] + params["emb_b"])
        assert (emb < 0).any()

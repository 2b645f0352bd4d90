"""Parity of the Pallas fused decode kernel against the XLA packed path.

The kernel (ops/fused_decode.py) must reproduce models.decoders'
nice_forward_packed — the tracking decode — bit-for-bit up to the shared bf16
matmul precision, in both the forward values and the pose-side gradients
(d raw / d points)."""

import os

import numpy as np
import pytest

os.environ.setdefault("ENSLAM_PALLAS", "0")  # default path stays XLA on CPU

import jax
import jax.numpy as jnp

from evennicer_slam_tpu.models.decoders import (
    init_nice_decoders,
    nice_forward,
    nice_forward_packed,
    pack_grids_for_tracking,
)
from evennicer_slam_tpu.models.grids import init_grids


@pytest.fixture(scope="module")
def scene():
    bound = np.array([[-1.0, 1.0], [-0.8, 0.8], [-0.6, 0.6]], np.float32)
    grid_len = {"coarse": 0.5, "middle": 0.25, "fine": 0.125, "color": 0.125,
                "bound_divisible": 0.25}
    grids = init_grids(jax.random.PRNGKey(0), bound, grid_len, c_dim=32,
                       coarse=False)
    # non-trivial grid content
    grids = {k: v + 0.3 * jax.random.normal(jax.random.PRNGKey(7), v.shape)
             for k, v in grids.items()}
    decoders = init_nice_decoders(jax.random.PRNGKey(1), coarse=False)
    packed = pack_grids_for_tracking(grids)
    n = 1500  # deliberately not a TILE multiple (exercises padding)
    p = jax.random.uniform(jax.random.PRNGKey(2), (n, 3),
                           minval=-1.1, maxval=1.1)
    p = p * jnp.array([1.0, 0.8, 0.6])
    return decoders, packed, p, jnp.asarray(bound)


def _with_pallas(flag):
    os.environ["ENSLAM_PALLAS"] = flag


def test_forward_parity(scene):
    decoders, packed, p, bound = scene
    _with_pallas("0")
    ref = np.asarray(nice_forward_packed(decoders, packed, p, bound))
    _with_pallas("1")
    try:
        out = np.asarray(nice_forward_packed(decoders, packed, p, bound))
    finally:
        _with_pallas("0")
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_pose_gradient_parity(scene):
    decoders, packed, p, bound = scene

    def loss(p, flag):
        _with_pallas(flag)
        try:
            raw = nice_forward_packed(decoders, packed, p, bound)
        finally:
            _with_pallas("0")
        # weight the channels asymmetrically so every output matters
        w = jnp.array([1.0, -0.5, 0.25, 2.0])
        return jnp.sum(raw * w)

    g_ref = np.asarray(jax.grad(lambda p: loss(p, "0"))(p))
    g_out = np.asarray(jax.grad(lambda p: loss(p, "1"))(p))
    # The kernel's backward genuinely rounds operands to bf16 (as the XLA
    # path does on real TPU hardware); on CPU, XLA's simplifier elides the
    # f32->bf16->f32 convert pair, so the reference here is effectively f32.
    # Bound the bf16 noise in aggregate instead of elementwise.
    assert np.abs(g_ref).max() > 1e-3  # non-degenerate test
    rel = np.linalg.norm(g_out - g_ref) / np.linalg.norm(g_ref)
    assert rel < 0.01, f"relative gradient error {rel:.4f}"
    cos = np.sum(g_out * g_ref) / (
        np.linalg.norm(g_out) * np.linalg.norm(g_ref)
    )
    assert cos > 0.9999, f"gradient direction cosine {cos:.6f}"


class TestPackedVsReference:
    """The tracking decode's PRECISION CONTRACT: nice_forward_packed — packed
    bf16 corner rows, bf16-accum matmuls, the materialized bf16 fourier
    embedding and its recompute-cos custom VJP — must stay within a bounded
    aggregate distance of the plain f32 color-stage nice_forward it
    re-implements (the semantic reference, per src/conv_onet/models/
    decoder.py:312-342). Catches precision regressions from future fast-path
    work (every round-3 decode optimization was required to be value- or
    bit-identical to its predecessor; this pins the whole chain to f32)."""

    @pytest.fixture(scope="class")
    def dense_scene(self, scene):
        decoders, packed, p, bound = scene
        # rebuild the compact f32 grids the packed snapshot was derived from
        grids = init_grids(jax.random.PRNGKey(0),
                           np.asarray(bound), {"coarse": 0.5, "middle": 0.25,
                                               "fine": 0.125, "color": 0.125,
                                               "bound_divisible": 0.25},
                           c_dim=32, coarse=False)
        grids = {k: v + 0.3 * jax.random.normal(jax.random.PRNGKey(7), v.shape)
                 for k, v in grids.items()}
        return decoders, grids, packed, p, bound

    def test_forward_close_to_f32(self, dense_scene):
        decoders, grids, packed, p, bound = dense_scene
        ref = np.asarray(nice_forward(decoders, grids, p, bound, "color"))
        out = np.asarray(nice_forward_packed(decoders, packed, p, bound))
        assert out.shape == ref.shape
        # aggregate: bf16 grid rows round at ~0.4% rel; the MLP chain keeps
        # f32 accumulation, so the output stays within ~1% in norm
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 0.01, f"packed-vs-f32 forward rel error {rel:.4f}"

    def test_pose_gradient_close_to_f32(self, dense_scene):
        decoders, grids, packed, p, bound = dense_scene
        w = jnp.array([1.0, -0.5, 0.25, 2.0])

        g_ref = np.asarray(jax.grad(
            lambda q: jnp.sum(nice_forward(decoders, grids, q, bound, "color") * w)
        )(p))
        g_out = np.asarray(jax.grad(
            lambda q: jnp.sum(nice_forward_packed(decoders, packed, q, bound) * w)
        )(p))
        assert np.abs(g_ref).max() > 1e-3
        # measured characterization of the bf16 backward chain (6 bf16-accum
        # GEMMs + bf16 corner rows + bf16 embedding cotangents): aggregate
        # rel error 0.075, aggregate direction cosine 0.9972, per-point
        # cosine mean 0.996 / p5 0.98. The bounds catch structural
        # regressions (missing terms, sign flips, dtype blowups), not the
        # inherent — and tracking-tolerated — bf16 noise.
        rel = np.linalg.norm(g_out - g_ref) / np.linalg.norm(g_ref)
        assert rel < 0.15, f"packed-vs-f32 gradient rel error {rel:.4f}"
        cos = np.sum(g_out * g_ref) / (
            np.linalg.norm(g_out) * np.linalg.norm(g_ref)
        )
        assert cos > 0.99, f"gradient direction cosine {cos:.6f}"

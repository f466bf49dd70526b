"""Windowed deformable-conv paths (ops/deform_conv.py `window_radius` +
ops/deform_conv_pallas.py) vs the gather formulation.

The gather path is itself oracle-tested against numpy in
test_ops.py; here every fast path must agree with it exactly:
- XLA shifted-window select (CPU branch of _dcn_dispatch), in-window
  offsets AND the lax.cond overflow fallback;
- the Pallas kernel in interpret mode (same trace the TPU runs);
- gradients through the custom_vjp (x, offsets, mask, weights);
- boundary semantics: samples outside the image contribute zero
  (reference dcn_v2_im2col_cuda.cu -1 < y < H guard).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.ops.deform_conv import deform_conv2d
from advancedliteratemachinery_tpu.ops.deform_conv_pallas import (
    dcn_windowed_pallas,
    dcn_windowed_pallas_supported,
)

B, H, W, CI, CO = 2, 16, 24, 5, 7


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, CI)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CI, CO)), jnp.float32)
    m = jnp.asarray(rng.uniform(0.2, 1, (B, H, W, 9)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((CO,)), jnp.float32)
    return rng, x, w, m, bias


class TestWindowedDispatch:
    def test_in_window_exact(self, inputs):
        rng, x, w, m, bias = inputs
        off = jnp.asarray(
            np.clip(rng.standard_normal((B, H, W, 9, 2)) * 1.2, -2.9, 2.9),
            jnp.float32)
        ref = deform_conv2d(x, off, m, w, bias)
        win = deform_conv2d(x, off, m, w, bias, window_radius=3)
        # the windowed path factors the bilinear product (cy·(cx·a+cx'·b))
        # where the gather path expands it — equal up to fp association
        np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                                   rtol=1e-5, atol=5e-5)

    def test_overflow_falls_back_exactly(self, inputs):
        rng, x, w, m, bias = inputs
        off = jnp.asarray(rng.standard_normal((B, H, W, 9, 2)) * 6.0,
                          jnp.float32)
        ref = deform_conv2d(x, off, m, w, bias)
        win = deform_conv2d(x, off, m, w, bias, window_radius=3)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(win))

    def test_gradients_match_gather_path(self, inputs):
        rng, x, w, m, _ = inputs
        off = jnp.asarray(rng.standard_normal((B, H, W, 9, 2)), jnp.float32)

        def loss(fn_kw):
            return jax.grad(
                lambda x_, o_, m_, w_: (deform_conv2d(x_, o_, m_, w_,
                                                      **fn_kw) ** 2).sum(),
                argnums=(0, 1, 2, 3))(x, off, m, w)

        g_ref = loss({})
        g_win = loss({"window_radius": 3})
        for a, b in zip(g_ref, g_win):
            # same gather math, different fusion → f32 association noise
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=5e-4)

    def test_radius_one_window(self, inputs):
        """Small radius still exact for sub-pixel offsets (the trained-DCN
        common case) and falls back beyond."""
        rng, x, w, m, _ = inputs
        off = jnp.asarray(rng.uniform(-0.9, 0.9, (B, H, W, 9, 2)),
                          jnp.float32)
        ref = deform_conv2d(x, off, m, w)
        win = deform_conv2d(x, off, m, w, window_radius=1)
        np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                                   rtol=1e-5, atol=5e-5)


class TestPallasKernel:
    def test_interpret_parity(self, inputs):
        rng, x, w, m, _ = inputs
        off = jnp.asarray(
            np.clip(rng.standard_normal((B, H, W, 9, 2)), -2.9, 2.9),
            jnp.float32)
        ref = deform_conv2d(x, off, m, w)
        got = dcn_windowed_pallas(x, off, m, w, radius=3, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_unaligned_rows_parity(self):
        """H % 8 != 0 (r5 widening): the kernel row-pads to the band
        height internally and slices — exact vs the gather oracle,
        including offsets that sample past the true last row (must read
        outside-image zero, NOT the zero-pad rows' neighbours)."""
        rng = np.random.default_rng(3)
        for h in (5, 12, 20):               # 20 = DLA level-5 at 640 px
            x = jnp.asarray(rng.standard_normal((2, h, 24, 5)), jnp.float32)
            w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
            m = jnp.asarray(rng.uniform(0.2, 1, (2, h, 24, 9)), jnp.float32)
            off = jnp.asarray(
                np.clip(rng.standard_normal((2, h, 24, 9, 2)) * 2, -2.9, 2.9),
                jnp.float32)
            ref = deform_conv2d(x, off, m, w)
            got = dcn_windowed_pallas(x, off, m, w, radius=3, interpret=True)
            assert got.shape == ref.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

    def test_out_of_image_zero_contribution(self, inputs):
        """Offsets pushing every sample far outside → windowed result is
        zero-coefficient, matching the reference's boundary guard."""
        _, x, w, m, _ = inputs
        off = jnp.full((B, H, W, 9, 2), 2.5, jnp.float32)
        ref = deform_conv2d(x, off, m, w)
        got = dcn_windowed_pallas(x, off, m, w, radius=3, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_supported_gate(self):
        assert dcn_windowed_pallas_supported((8, 192, 192, 64), 3, 3, 1,
                                             3, 1)
        assert not dcn_windowed_pallas_supported((1, 192, 192, 64), 3, 3,
                                                 2, 3, 1)   # stride 2
        assert not dcn_windowed_pallas_supported((1, 768, 768, 256), 3, 3,
                                                 1, 3, 1)   # VMEM blowout
        # H % 8 != 0 is eligible since r5 (kernel row-pads internally) —
        # DLA's smallest pyramid level at 640-px pages is 20 rows
        assert dcn_windowed_pallas_supported((1, 28, 192, 64), 3, 3, 1,
                                             3, 1)
        # output size must equal input (kernel hardcodes out_shape):
        # padding=0 or dilation breaking 2p == d(k-1) must be rejected
        assert not dcn_windowed_pallas_supported((8, 192, 192, 64), 3, 3,
                                                 1, 3, 0)   # padding 0
        assert not dcn_windowed_pallas_supported((8, 192, 192, 64), 3, 3,
                                                 1, 3, 1, dilation=2)
        assert dcn_windowed_pallas_supported((8, 192, 192, 64), 3, 3, 1,
                                             3, 2, dilation=2)
        # f32 inputs are 2x the VMEM of bf16 — borderline shapes flip
        assert dcn_windowed_pallas_supported((1, 384, 384, 96), 3, 3, 1,
                                             3, 1, itemsize=2)
        assert not dcn_windowed_pallas_supported((1, 384, 384, 96), 3, 3,
                                                 1, 3, 1, itemsize=4)

    def test_padding0_dispatch_no_crash(self):
        """ADVICE r4 (medium): deform_conv2d with window_radius and
        padding=0 used to crash at trace time on TPU because the Pallas
        kernel hardcodes same-size output; the gate now rejects it and
        the gather path produces the correctly-shaped result."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((1, 14, 14, 9, 2)) * 0.3,
                          jnp.float32)
        m = jnp.asarray(rng.uniform(0, 1, (1, 14, 14, 9)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 8, 5)) * 0.1, jnp.float32)
        out = deform_conv2d(x, off, m, w, padding=0, window_radius=3)
        assert out.shape == (1, 14, 14, 5)
        ref = deform_conv2d(x, off, m, w, padding=0)   # gather reference
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestSparseCorrection:
    """Out-of-window tail samples are corrected exactly (scatter-add of
    their true bilinear contributions) instead of disabling the fast path
    — the real-checkpoint regime (heavy-tailed offsets)."""

    def test_sparse_tail_exact(self, inputs):
        rng, x, w, m, bias = inputs
        off_np = np.where(rng.uniform(size=(B, H, W, 9, 2)) < 0.002,
                          rng.standard_normal((B, H, W, 9, 2)) * 8,
                          rng.standard_normal((B, H, W, 9, 2)) * 0.8)
        off = jnp.asarray(off_np.astype(np.float32))
        ref = deform_conv2d(x, off, m, w, bias)
        win = deform_conv2d(x, off, m, w, bias, window_radius=3)
        np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                                   rtol=1e-5, atol=5e-5)

    def test_boundary_floor_not_double_counted(self, inputs):
        """⌊δ⌋ = R+1 exactly: the window would otherwise keep one partial
        corner AND the correction would re-add the full sample."""
        _, x, w, m, bias = inputs
        off = jnp.full((B, H, W, 9, 2), 4.3, jnp.float32)
        ref = deform_conv2d(x, off, m, w, bias)
        win = deform_conv2d(x, off, m, w, bias, window_radius=3)
        np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                                   rtol=1e-5, atol=5e-5)

    def test_budget_overflow_falls_back(self, inputs):
        rng, x, w, m, bias = inputs
        off = jnp.asarray(rng.standard_normal((B, H, W, 9, 2)) * 20,
                          jnp.float32)
        ref = deform_conv2d(x, off, m, w, bias)
        win = deform_conv2d(x, off, m, w, bias, window_radius=3)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(win))

    def test_grads_through_correction(self, inputs):
        rng, x, w, m, _ = inputs
        off_np = np.where(rng.uniform(size=(B, H, W, 9, 2)) < 0.01, 7.0,
                          0.4)
        off = jnp.asarray(off_np.astype(np.float32))
        g1 = jax.grad(lambda x_, o_: deform_conv2d(x_, o_, m, w).sum(),
                      argnums=(0, 1))(x, off)
        g2 = jax.grad(lambda x_, o_: deform_conv2d(
            x_, o_, m, w, window_radius=3).sum(), argnums=(0, 1))(x, off)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=5e-5)

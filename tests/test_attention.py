"""Attention op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fast


class TestFusedQKVGrad:
    """Pallas fused attention must be differentiable (train graphs hit it
    on TPU): backward recomputes via the einsum VJP."""

    def test_grad_matches_einsum_vjp(self):
        from advancedliteratemachinery_tpu.ops.attention import (
            _einsum_attention_from_qkv, fused_qkv_attention)
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.standard_normal((2, 16, 3 * 128)) * 0.1,
                          jnp.float32)
        g = jax.grad(lambda x: fused_qkv_attention(
            x, 2, None, True, True).sum())(qkv)
        ref = jax.grad(lambda x: _einsum_attention_from_qkv(
            x, 2, 64 ** -0.5).sum())(qkv)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

import jax
import jax.numpy as jnp
import numpy as np

from advancedliteratemachinery_tpu.ops.attention import (
    attention, fused_qkv_attention, mha_short_seq, supports_fused_qkv)


def _einsum_ref(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


class TestAttentionDispatch:
    def test_cpu_falls_back_to_einsum(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 2, 64))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2, 64))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 2, 64))
        got = attention(q, k, v)
        want = _einsum_ref(q, k, v, 64 ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_mask_applied(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 1, 64))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 1, 64))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 1, 64))
        mask = jnp.ones((1, 1, 4, 4), bool).at[:, :, :, 3].set(False)
        out = attention(q, k, v, mask=mask)
        # output must not depend on masked key/value 3
        v2 = v.at[:, 3].set(99.0)
        out2 = attention(q, k, v2, mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    def test_fused_qkv_interpret_mode(self):
        """fused_qkv_attention (the encoder hot path on TPU) vs einsum
        oracle, run in Pallas interpreter mode on CPU — both safe and
        unsafe-softmax variants."""
        B, S, H, hd = 2, 16, 2, 64
        D = H * hd
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, hd))
        k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, hd))
        v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, hd))
        qkv = jnp.concatenate(
            [t.reshape(B, S, D) for t in (q, k, v)], axis=-1)
        want = _einsum_ref(q, k, v, hd ** -0.5).reshape(B, S, D)
        for safe in (True, False):
            got = fused_qkv_attention(qkv, H, safe=safe, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_fused_qkv_backward_kernel_matches_einsum_vjp(self):
        """The Pallas backward kernel (interpret mode) must produce the
        same dQKV as differentiating the einsum formulation."""
        from advancedliteratemachinery_tpu.ops.attention import (
            _einsum_attention_from_qkv)

        B, S, H, hd = 2, 16, 2, 64
        D = H * hd
        qkv = jax.random.normal(jax.random.PRNGKey(3), (B, S, 3 * D))
        cotangent_seed = jax.random.normal(jax.random.PRNGKey(4), (B, S, D))

        def loss_pallas(t):
            out = fused_qkv_attention(t, H, interpret=True)
            return jnp.sum(out * cotangent_seed)

        def loss_einsum(t):
            out = _einsum_attention_from_qkv(t, H, hd ** -0.5)
            return jnp.sum(out * cotangent_seed)

        g_pallas = jax.grad(loss_pallas)(qkv)
        g_einsum = jax.grad(loss_einsum)(qkv)
        np.testing.assert_allclose(np.asarray(g_pallas),
                                   np.asarray(g_einsum),
                                   rtol=2e-4, atol=2e-4)

    def test_supports_fused_qkv_gates(self):
        # CPU backend → never
        assert not supports_fused_qkv(8, 257, 768, 12)

    def test_pallas_kernel_interpret_mode(self):
        """Run the Pallas kernel in interpreter mode on CPU vs einsum oracle."""
        from functools import partial

        import advancedliteratemachinery_tpu.ops.attention as A
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B, S, H, hd = 2, 16, 2, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, hd))
        k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, hd))
        v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, hd))
        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        spec = pl.BlockSpec((1, 1, S, hd), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(A._mha_kernel, scale=hd ** -0.5),
            out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
            grid=(B, H), in_specs=[spec, spec, spec], out_specs=spec,
            interpret=True,
        )(qt, kt, vt).transpose(0, 2, 1, 3)
        want = _einsum_ref(q, k, v, hd ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

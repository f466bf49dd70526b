"""Ring attention (parallel/ring_attention.py) on the virtual 8-dev mesh.

No reference analog to mirror (SURVEY §5: the reference has no sequence
parallelism); the oracle is plain full-sequence softmax attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.parallel.ring_attention import (
    create_seq_mesh,
    ring_attention,
)

pytestmark = pytest.mark.model


def _full_attention(q, k, v, causal):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bqhk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if causal:
        S = q.shape[1]
        mask = jnp.tril(jnp.ones((S, S), bool))[None, :, None, :]
        s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqhk,bkhd->bqhd", p, v.astype(jnp.float32))


def _qkv(key, B=2, S=32, H=2, hd=16):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (B, S, H, hd)),
            jax.random.normal(kk, (B, S, H, hd)),
            jax.random.normal(kv, (B, S, H, hd)))


class TestRingAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_full_attention(self, causal):
        q, k, v = _qkv(jax.random.PRNGKey(0))
        mesh = create_seq_mesh(seq=8)
        out = jax.jit(
            lambda q, k, v: ring_attention(q, k, v, mesh, causal=causal)
        )(q, k, v)
        ref = _full_attention(q, k, v, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_data_times_seq_mesh(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), B=4, S=16)
        mesh = create_seq_mesh(seq=4, data=2)
        out = jax.jit(
            lambda q, k, v: ring_attention(q, k, v, mesh, causal=True)
        )(q, k, v)
        ref = _full_attention(q, k, v, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match(self):
        q, k, v = _qkv(jax.random.PRNGKey(2), B=1, S=16, H=1, hd=8)
        mesh = create_seq_mesh(seq=4, devices=jax.devices()[:4])
        tgt = jax.random.normal(jax.random.PRNGKey(3), q.shape)

        def ring_loss(q, k, v):
            return jnp.mean(
                (ring_attention(q, k, v, mesh, causal=True) - tgt) ** 2)

        def full_loss(q, k, v):
            return jnp.mean((_full_attention(q, k, v, True) - tgt) ** 2)

        gr = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
        gf = jax.jit(jax.grad(full_loss, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_trcg_seq_call_matches_forward(self):
        """The model integration: TRCG.seq_call (every LlamaBlock
        attending via ring attention over an 8-way seq mesh) reproduces
        the plain __call__ logits."""
        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.models.trcg import (
            TRCG, TRCGConfig)
        from advancedliteratemachinery_tpu.models.vit import ViTConfig

        cfg = TRCGConfig(
            vocab_size=64, hidden_size=32, num_layers=2, heads=2,
            max_seq=64,
            vision=ViTConfig(img_size=(16, 16), patch_size=16,
                             embed_dim=32, depth=1, num_heads=2))
        model = TRCG(cfg, policy=FP32_POLICY)
        # prefix = 2 image tokens (1 patch + cls → 1 after drop? use
        # whatever _prefix yields) + text; pick text len so total % 8 == 0
        imgs = jnp.zeros((2, 16, 16, 3), jnp.float32)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(1, 60, (2, 15)), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), imgs, ids)
        ref = model.apply(variables, imgs, ids)
        T = ref.shape[1]
        if T % 8:   # pad text to a divisible total
            ids = jnp.asarray(np.random.default_rng(0).integers(
                1, 60, (2, 15 + (8 - T % 8))), jnp.int32)
            ref = model.apply(variables, imgs, ids)
        mesh = create_seq_mesh(seq=8)
        got = jax.jit(lambda v, im, i: model.apply(
            v, im, i, mesh, method=TRCG.seq_call))(variables, imgs, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_seq_call_validates_divisibility(self):
        from advancedliteratemachinery_tpu.models.trcg import (
            TRCG, TRCGConfig)
        from advancedliteratemachinery_tpu.models.vit import ViTConfig

        cfg = TRCGConfig(
            vocab_size=64, hidden_size=32, num_layers=1, heads=2,
            max_seq=64,
            vision=ViTConfig(img_size=(16, 16), patch_size=16,
                             embed_dim=32, depth=1, num_heads=2))
        model = TRCG(cfg)
        imgs = jnp.zeros((1, 16, 16, 3), jnp.float32)
        ids = jnp.ones((1, 3), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), imgs, ids)
        mesh = create_seq_mesh(seq=8)
        T = model.apply(variables, imgs, ids).shape[1]
        if T % 8 == 0:
            pytest.skip("accidentally divisible")
        with pytest.raises(ValueError, match="not divisible"):
            model.apply(variables, imgs, ids, mesh, method=TRCG.seq_call)

    def test_bf16_inputs_fp32_accumulation(self):
        q, k, v = _qkv(jax.random.PRNGKey(4))
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        mesh = create_seq_mesh(seq=8)
        out = jax.jit(
            lambda q, k, v: ring_attention(q, k, v, mesh, causal=False)
        )(qb, kb, vb)
        assert out.dtype == jnp.bfloat16
        ref = _full_attention(qb, kb, vb, False)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05)

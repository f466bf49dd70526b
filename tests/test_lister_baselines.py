import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.lister_baselines import (
    CTCDecoder,
    ParallelAttention,
    RNNAttention,
    ctc_greedy_loss,
)


def _feat(B=2, h=1, w=12, C=16):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, C))
    mask = jnp.ones((B, h, w))
    return x, mask


class TestCTC:
    def test_shapes_and_loss(self):
        x, mask = _feat()
        dec = CTCDecoder(37, policy=FP32_POLICY)
        vars_ = dec.init(jax.random.PRNGKey(0), x, mask)
        out = dec.apply(vars_, x, mask)
        assert out["logits"].shape == (2, 12, 37)
        labels = jnp.asarray([[5, 6, 7, 0], [3, 0, 0, 0]], jnp.int32)
        lens = jnp.asarray([3, 1])
        loss = ctc_greedy_loss(out["logits"], out["mask"], labels, lens)
        assert np.isfinite(float(loss)) and float(loss) > 0


class TestPAT:
    def test_attention_is_masked_distribution(self):
        x, mask = _feat()
        mask = mask.at[:, :, 8:].set(0)
        dec = ParallelAttention(37, max_ch=26, policy=FP32_POLICY)
        vars_ = dec.init(jax.random.PRNGKey(0), x, mask)
        out = dec.apply(vars_, x, mask)
        assert out["logits"].shape == (2, 26, 37)
        att = np.asarray(out["char_maps"])
        np.testing.assert_allclose(att.sum(-1), 1.0, atol=1e-5)
        assert att[:, :, 8:].max() < 1e-6  # masked positions get no attention


class TestRNNAttention:
    def test_teacher_forcing_vs_greedy(self):
        x, mask = _feat()
        dec = RNNAttention(37, hidden_size=32, num_steps=6, policy=FP32_POLICY)
        tgt = jnp.asarray(np.random.default_rng(0).integers(0, 37, (2, 6)))
        vars_ = dec.init(jax.random.PRNGKey(0), x, mask, tgt)
        out_tf = dec.apply(vars_, x, mask, tgt)
        out_greedy = dec.apply(vars_, x, mask)
        assert out_tf["logits"].shape == (2, 6, 37)
        # first step identical (same GO feedback), later steps may differ
        np.testing.assert_allclose(np.asarray(out_tf["logits"][:, 0]),
                                   np.asarray(out_greedy["logits"][:, 0]),
                                   atol=1e-5)

"""Fused vocab-head greedy decode kernel vs the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.ops.vocab_decode import (
    matmul_greedy_decode, matmul_greedy_decode_xla)

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("M,D,V,true_vocab,tv", [
    (64, 128, 1024, 1000, 256),    # even tiling + vocab padding
    (50, 128, 1152, 1152, 512),    # M not tile-aligned, V padded to 1536
    (8, 64, 640, 517, 128),        # heavy vocab padding
])
def test_matches_xla_oracle(M, D, V, true_vocab, tv):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((M, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, V)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((V,)), jnp.float32)

    want_ids, want_pmax = matmul_greedy_decode_xla(tokens, w, b, true_vocab)
    got_ids, got_pmax = matmul_greedy_decode(tokens, w, b, true_vocab,
                                             tm=128, tv=tv, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_allclose(np.asarray(got_pmax), np.asarray(want_pmax),
                               rtol=1e-5, atol=1e-6)


def test_bf16_inputs_close_to_f32_oracle():
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.standard_normal((40, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((256, 1280)) * 0.05, jnp.bfloat16)
    want_ids, want_pmax = matmul_greedy_decode_xla(tokens, w, None, 1280)
    got_ids, got_pmax = matmul_greedy_decode(tokens, w, None, 1280,
                                             tm=128, tv=256, interpret=True)
    # same matmul dtype on both paths -> identical argmax
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_allclose(np.asarray(got_pmax), np.asarray(want_pmax),
                               rtol=1e-3, atol=1e-4)


def test_no_eos_in_padding_region():
    # padded columns must never win the argmax even with huge weights there
    tokens = jnp.ones((4, 8), jnp.float32)
    w = jnp.zeros((8, 256), jnp.float32).at[:, 200:].set(100.0)
    ids, pmax = matmul_greedy_decode(tokens, w, None, true_vocab=200,
                                     tm=128, tv=128, interpret=True)
    assert np.asarray(ids).max() < 200
    np.testing.assert_allclose(np.asarray(pmax), 1.0 / 200, rtol=1e-5)

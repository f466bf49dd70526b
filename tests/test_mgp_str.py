import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig, TokenLearner
from advancedliteratemachinery_tpu.models.vit import VIT_VARIANTS


TINY = MGPSTRConfig(variant="tiny")


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = MGPSTR(TINY, policy=FP32_POLICY)
    x = jnp.zeros((2, 32, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


class TestMGPSTRShapes:
    def test_output_shapes(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        x = jnp.zeros((2, 32, 128, 3), jnp.float32)
        out = model.apply({"params": params}, x)
        # 27 output tokens (batch_max_length 25 + GO + EOS), vocabs per head
        assert out["char"].shape == (2, 27, 38)
        # vocab dims padded to multiples of 128 (MXU tiles / TP divisibility)
        assert out["bpe"].shape == (2, 27, 50304)
        assert out["wp"].shape == (2, 27, 30592)

    def test_attention_maps(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        x = jnp.zeros((1, 32, 128, 3), jnp.float32)
        out = model.apply({"params": params}, x, return_attn=True)
        # 257 spatial tokens (8*32 patches + cls)
        assert out["char_attn"].shape == (1, 27, 257)
        # softmax over spatial axis sums to 1 per output token
        np.testing.assert_allclose(
            np.asarray(jnp.sum(out["char_attn"], axis=-1)), 1.0, atol=1e-5
        )

    def test_jit_and_determinism(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 128, 3))
        f = jax.jit(lambda p, x: model.apply({"params": p}, x))
        a = f(params, x)
        b = f(params, x)
        np.testing.assert_array_equal(np.asarray(a["char"]), np.asarray(b["char"]))

    def test_variant_dims(self):
        assert VIT_VARIANTS["base"].embed_dim == 768
        assert VIT_VARIANTS["large"].depth == 24
        assert VIT_VARIANTS["tiny"].seq_len == 257


class TestTokenLearner:
    def test_matches_reference_math(self):
        """TokenLearner == softmax(sel) @ grouped_feat, vs explicit numpy."""
        tl = TokenLearner(out_tokens=4, groups=2, policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8))
        params = tl.init(jax.random.PRNGKey(1), x)["params"]
        attn, tokens = tl.apply({"params": params}, x)

        # numpy oracle
        xn = np.asarray(x)[0]
        ln = params["token_norm"]
        mu = xn.mean(-1, keepdims=True)
        var = xn.var(-1, keepdims=True)
        xh = (xn - mu) / np.sqrt(var + 1e-6) * np.asarray(ln["scale"]) + np.asarray(ln["bias"])

        def grouped(xin, k):
            k = np.asarray(k)  # [G, D/G, O/G]
            G, dg, og = k.shape
            xg = xin.reshape(xin.shape[0], G, dg)
            return np.einsum("sgi,gio->sgo", xg, k).reshape(xin.shape[0], G * og)

        sel = grouped(xh, params["select_group"]["kernel"])
        sel = sel @ np.asarray(params["select_proj"]["kernel"])
        e = np.exp(sel - sel.max(axis=0, keepdims=True))
        a = e / e.sum(axis=0, keepdims=True)  # softmax over S
        feat = grouped(xh, params["feat"]["kernel"])
        tok = a.T @ feat  # [T, D]
        ln2 = params["norm"]
        mu2 = tok.mean(-1, keepdims=True)
        var2 = tok.var(-1, keepdims=True)
        tok = (tok - mu2) / np.sqrt(var2 + 1e-6) * np.asarray(ln2["scale"]) + np.asarray(ln2["bias"])

        np.testing.assert_allclose(np.asarray(tokens)[0], tok, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(attn)[0], a.T, rtol=2e-4, atol=2e-4)


class TestFusedDecodeEquivalence:
    """Engine fused vocab-decode path (interpret-mode Pallas) must match
    the XLA logits path bit-for-bit on ids and closely on confidences."""

    def test_engine_paths_agree(self, tiny_model_and_params):
        from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
        from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference

        model, params = tiny_model_and_params
        rng = np.random.default_rng(0)
        images = rng.integers(0, 256, (3, 32, 128, 3), dtype=np.uint8)

        base = MGPSTRInference(model, params, CharCodec(),
                               input_dtype=jnp.float32, fused_decode="never")
        fused = MGPSTRInference(model, params, CharCodec(),
                                input_dtype=jnp.float32,
                                fused_decode="interpret")
        assert set(fused._fused_heads) == {"bpe", "wp"}
        a = base(images)
        b = fused(images)
        for head in ("char", "bpe", "wp"):
            np.testing.assert_array_equal(a[f"{head}_ids"], b[f"{head}_ids"])
            np.testing.assert_allclose(a[f"{head}_conf"], b[f"{head}_conf"],
                                       rtol=1e-4, atol=1e-5)


class TestCharStrEngine:
    def test_char_only_variant_through_engine(self):
        from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
        from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference

        cfg = MGPSTRConfig(variant="tiny", heads=("char",))
        model = MGPSTR(cfg, policy=FP32_POLICY)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 128, 3)))["params"]
        eng = MGPSTRInference(model, params, CharCodec(),
                              input_dtype=jnp.float32)
        assert eng._fused_heads == ()
        out = eng(np.random.default_rng(0).integers(
            0, 256, (2, 32, 128, 3), dtype=np.uint8))
        assert out["char_ids"].shape == (2, 26)
        res = eng.recognize(np.random.default_rng(1).integers(
            0, 256, (2, 32, 128, 3), dtype=np.uint8))
        assert len(res) == 2 and res[0][2] == "char"

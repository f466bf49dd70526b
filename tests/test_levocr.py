import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.abinet import (
    ABINetVision,
    ABINetVisionConfig,
)
from advancedliteratemachinery_tpu.models.levocr import (
    BOS,
    EOS,
    PAD,
    UNK,
    LevOCR,
    LevOCRConfig,
    LevtDictionary,
    levt_losses,
)
from advancedliteratemachinery_tpu.ops.levenshtein import (
    apply_del_words,
    apply_ins_masks,
    apply_ins_words,
    ins_del_targets,
    random_delete,
)


class TestEditAlignment:
    def test_pure_insertion(self):
        # noised [bos a c eos], target [bos a b c eos] → insert 'b' after 'a'
        d = LevtDictionary("abc", max_len=8)
        in_t = d.encode(["ac"])
        out_t = d.encode(["abc"])
        masked, masked_tok, ins_t, del_t = ins_del_targets(in_t, out_t, PAD, UNK)
        # out = [bos a b c eos]: only 'b' (pos 2) inserted
        np.testing.assert_array_equal(masked[0, :5], [0, 0, 1, 0, 0])
        assert masked_tok[0, 2] == UNK
        # slots between [bos,a], [a,c], [c,eos] → 0, 1, 0
        np.testing.assert_array_equal(ins_t[0, :3], [0, 1, 0])
        np.testing.assert_array_equal(del_t[0, :4], [0, 0, 0, 0])

    def test_pure_deletion(self):
        d = LevtDictionary("abc", max_len=8)
        in_t = d.encode(["abc"])
        out_t = d.encode(["ac"])
        _, _, ins_t, del_t = ins_del_targets(in_t, out_t, PAD, UNK)
        np.testing.assert_array_equal(del_t[0, :5], [0, 0, 1, 0, 0])  # delete 'b'
        assert ins_t[0].sum() == 0

    def test_identical(self):
        d = LevtDictionary("abc", max_len=8)
        t = d.encode(["abc"])
        masked, _, ins_t, del_t = ins_del_targets(t, t, PAD, UNK)
        assert masked.sum() == 0 and ins_t.sum() == 0 and del_t.sum() == 0

    def test_random_delete_keeps_structure(self):
        d = LevtDictionary(max_len=12)
        t = d.encode(["hello1", "worlds"])
        rng = np.random.default_rng(0)
        noised = random_delete(rng, t, PAD, BOS, EOS)
        for b in range(2):
            row = [x for x in noised[b] if x != PAD]
            assert row[0] == BOS and row[-1] == EOS
            assert len(row) <= 8


class TestEditOps:
    def test_apply_del(self):
        toks = jnp.asarray([[BOS, 5, 6, 7, EOS, PAD]])
        scores = jnp.zeros((1, 6))
        delp = jnp.asarray([[False, True, False, True, False, False]])
        out, _ = apply_del_words(toks, scores, delp, PAD, BOS, EOS)
        np.testing.assert_array_equal(np.asarray(out[0]), [BOS, 6, EOS, PAD, PAD, PAD])

    def test_del_protects_specials(self):
        toks = jnp.asarray([[BOS, 5, EOS, PAD]])
        delp = jnp.ones((1, 4), bool)
        out, _ = apply_del_words(toks, jnp.zeros((1, 4)), delp, PAD, BOS, EOS)
        np.testing.assert_array_equal(np.asarray(out[0]), [BOS, EOS, PAD, PAD])

    def test_apply_ins_masks(self):
        toks = jnp.asarray([[BOS, 5, EOS, PAD, PAD, PAD]])
        ins = jnp.asarray([[1, 0, 2, 0, 0]])  # 1 after bos; slot 2 invalid (eos)
        out, _ = apply_ins_masks(toks, jnp.zeros((1, 6)), ins, PAD, UNK)
        np.testing.assert_array_equal(np.asarray(out[0]),
                                      [BOS, UNK, 5, EOS, PAD, PAD])

    def test_ins_overflow_clamped(self):
        toks = jnp.asarray([[BOS, 5, 6, EOS]])
        ins = jnp.asarray([[9, 9, 9]])
        out, _ = apply_ins_masks(toks, jnp.zeros((1, 4)), ins, PAD, UNK)
        row = np.asarray(out[0])
        assert (row != PAD).sum() == 4  # buffer full, nothing lost
        assert row[0] == BOS

    def test_apply_ins_words(self):
        toks = jnp.asarray([[BOS, UNK, 7, UNK]])
        pred = jnp.asarray([[9, 5, 9, 6]])
        out, _ = apply_ins_words(toks, jnp.zeros((1, 4)), pred,
                                 jnp.zeros((1, 4)), UNK)
        np.testing.assert_array_equal(np.asarray(out[0]), [BOS, 5, 7, 6])

    def test_del_then_ins_roundtrip(self):
        """delete 'b' from [a b c] then insert one slot back → unk where b was."""
        toks = jnp.asarray([[BOS, 5, 6, 7, EOS, PAD]])
        delp = jnp.asarray([[0, 0, 1, 0, 0, 0]], bool)
        t1, s1 = apply_del_words(toks, jnp.zeros((1, 6)), delp, PAD, BOS, EOS)
        ins = jnp.asarray([[0, 1, 0, 0, 0]])
        t2, _ = apply_ins_masks(t1, s1, ins, PAD, UNK)
        np.testing.assert_array_equal(np.asarray(t2[0]), [BOS, 5, UNK, 7, EOS, PAD])


class TestLevtDictionary:
    def test_roundtrip(self):
        d = LevtDictionary(max_len=10)
        ids = d.encode(["abc", "z9"])
        assert ids[0, 0] == BOS and ids[0, 4] == EOS
        assert d.decode(ids) == ["abc", "z9"]


TINY_VISION = ABINetVisionConfig(max_length=8, num_classes=37, d_model=64,
                                 backbone_layers=1)
TINY = LevOCRConfig(max_len=10, d_model=64, heads=2, ffn=128, layers=1,
                    max_iter=1, vision=TINY_VISION)


@pytest.fixture(scope="module")
def tiny_levocr():
    model = LevOCR(TINY, policy=FP32_POLICY)
    images = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 128, 3))
    d = LevtDictionary(max_len=TINY.max_len)
    noised = jnp.asarray(d.encode(["ab", "xy"]))
    masked = jnp.asarray(d.encode(["abc", "xyz"]))
    preds = jnp.asarray(d.encode(["abcd", "xyzw"]))
    vars_ = model.init(jax.random.PRNGKey(1), images, noised, masked, preds)
    return model, vars_, d, images, noised, masked, preds


class TestABINetVision:
    def test_shapes(self):
        model = ABINetVision(TINY_VISION, policy=FP32_POLICY)
        x = jnp.zeros((1, 32, 128, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(vars_, x)
        assert out["features"].shape == (1, 8, 32, 64)
        assert out["logits"].shape == (1, 8, 37)
        assert out["attn_scores"].shape == (1, 8, 8, 32)


class TestLevOCR:
    def test_train_forward_shapes(self, tiny_levocr):
        model, vars_, d, images, noised, masked, preds = tiny_levocr
        res, _ = model.apply(vars_, images, noised, masked, preds,
                             mutable=["batch_stats"])
        L = TINY.max_len
        assert res["mask_ins_logits"].shape == (2, L - 1, 256)
        assert res["word_ins_logits"].shape == (2, L, TINY.vocab_size)
        assert res["word_del_logits"].shape == (2, L, 2)
        assert res["vision_logits"].shape == (2, 8, 37)

    def test_losses_finite_and_grad(self, tiny_levocr):
        model, vars_, d, images, noised, masked, preds = tiny_levocr
        tgt = jnp.asarray(d.encode(["abc", "xyz"]))
        m, mt, ins_t, del_t = ins_del_targets(
            np.asarray(noised), np.asarray(tgt), PAD, UNK)
        targets = {
            "mask_ins_targets": jnp.asarray(ins_t),
            "mask_ins_masks": jnp.asarray(np.asarray(noised)[:, 1:] != PAD),
            "word_ins_targets": tgt,
            "word_ins_masks": jnp.asarray(m),
            "word_del_targets": jnp.asarray(del_t),
            "word_del_masks": jnp.asarray(np.asarray(preds) != PAD),
            "vision_targets": jnp.zeros((2, 8), jnp.int32),
        }

        def loss_fn(params):
            res, _ = model.apply(
                {"params": params, **{k: v for k, v in vars_.items() if k != "params"}},
                images, noised, masked, preds, mutable=["batch_stats"])
            return levt_losses(res, targets, TINY)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(vars_["params"])
        assert np.isfinite(float(loss))
        gn = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
        assert float(gn) > 0

    def test_refine_runs(self, tiny_levocr):
        model, vars_, d, images, *_ = tiny_levocr
        out = jax.jit(lambda v, x: model.apply(v, x, method=model.refine))(
            vars_, images)
        assert out["tokens"].shape == (2, TINY.max_len)
        toks = np.asarray(out["tokens"])
        # structure: starts with BOS, contains exactly one EOS per row, no UNK
        for row in toks:
            assert row[0] == BOS
            assert (row == EOS).sum() >= 1
            assert UNK not in row[: list(row).index(EOS)]
        # decodes to strings without error
        texts = d.decode(toks[:, 1:])
        assert len(texts) == 2

"""LevOCR language-branch pretraining (reference train_language_dist.py):
text corpus + SpellingMutation roll-in -> LevT imitation targets ->
text_forward losses, no vision."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.data.text_corpus import (
    SpellingMutation,
    TextCorpusDataset,
)
from advancedliteratemachinery_tpu.models.levocr import (
    LevOCR,
    LevOCRConfig,
    LevtDictionary,
)


class TestSpellingMutation:
    def test_digit_words_pass_through(self):
        sm = SpellingMutation(seed=0)
        assert sm("12345") == "12345"
        assert sm("a1234") == "a1234"     # digit-majority

    def test_mutates_some_words(self):
        sm = SpellingMutation(pn0=0.0, seed=0)   # always modify >= 1
        words = ["hello", "worlds", "testing", "alphabet"]
        out = [sm(w) for w in words]
        assert any(o != w for o, w in zip(out, words))
        # never empty, bounded by max_length-1
        assert all(1 <= len(o) <= 24 for o in out)

    def test_deterministic_under_seed(self):
        w = ["mutation"] * 20
        a = [SpellingMutation(seed=5)(x) for x in w]
        b = [SpellingMutation(seed=5)(x) for x in w]
        assert a == b


class TestTextCorpus:
    def test_parse_filters_and_lowercases(self, tmp_path):
        p = tmp_path / "corpus.txt"
        p.write_text("Hello, World!\n\n#$%\nABC-123\n")
        ds = TextCorpusDataset(str(p))
        assert len(ds) == 2
        assert ds[0] == "helloworld"
        assert ds[1] == "abc123"


class TestLanguageTraining:
    def test_batches_and_text_forward_loss(self, tmp_path):
        from advancedliteratemachinery_tpu.engine.batches import (
            levocr_text_batches, levocr_text_recipe)

        p = tmp_path / "corpus.txt"
        p.write_text("\n".join(["hello", "world", "jax", "levocr",
                                "tokens", "refine"]))
        cfg = LevOCRConfig(d_model=32, layers=1, heads=2, ffn=64,
                           max_len=12)
        d = LevtDictionary(max_len=cfg.max_len)
        model = LevOCR(cfg, policy=FP32_POLICY)
        corpus = TextCorpusDataset(str(p), max_length=8)
        it = levocr_text_batches(corpus, d, batch_size=4, seed=0)
        b = next(it)
        assert "images" not in b and "vision_targets" not in b
        assert b["noised_tokens"].shape == b["word_ins_targets"].shape

        tok = jnp.asarray(d.encode([""]))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 128, 3)), tok, tok, tok)
        loss_fn, tx = levocr_text_recipe(model, cfg)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"],
                                   {k: jnp.asarray(v) for k, v in b.items()},
                                   jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert "vision_loss" not in metrics
        # vision tower receives zero gradients; the LevT text path does not
        g_txt = jax.tree.leaves(grads["text_encoder"])
        assert any(float(jnp.abs(g).sum()) > 0 for g in g_txt)
        g_vis = jax.tree.leaves(grads["vision"]) if "vision" in grads else []
        assert all(float(jnp.abs(g).sum()) == 0 for g in g_vis)


class TestLanguageTrainCLI:
    def test_cli_language_smoke(self, monkeypatch, tmp_path):
        import advancedliteratemachinery_tpu.models.levocr as ML

        orig = ML.LevOCRConfig

        def tiny_cfg(**kw):
            kw.update(d_model=32, layers=1, heads=2, ffn=64, max_len=12)
            return orig(**kw)

        monkeypatch.setattr(ML, "LevOCRConfig", tiny_cfg)
        corpus = tmp_path / "c.txt"
        corpus.write_text("\n".join(["hello", "world", "text", "branch",
                                     "only", "train", "run", "done"]))
        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["train", "levocr", "--task", "language",
                       "--train-data", str(corpus), "--batch-size", "8",
                       "--steps", "2", "--log-interval", "1",
                       "--batch-max-length", "8",
                       "--ckpt-dir", str(tmp_path / "run")])
        assert rc == 0

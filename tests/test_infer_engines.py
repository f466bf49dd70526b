"""LISTER / LevOCR batched inference engines (engine/infer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY

pytestmark = pytest.mark.model


class TestLISTERInference:
    def test_recognize_runs_and_confidence_bounded(self):
        from advancedliteratemachinery_tpu.engine.infer import LISTERInference
        from advancedliteratemachinery_tpu.models.lister import (
            LISTER, LISTERConfig)

        cfg = LISTERConfig(variant="tiny")
        model = LISTER(cfg, policy=FP32_POLICY)
        x = jnp.zeros((1, 32, 128, 3))
        params = model.init(jax.random.PRNGKey(0), x,
                            jnp.ones((1, 32, 128)))["params"]
        eng = LISTERInference(model, params, input_dtype=jnp.float32)
        out = eng.recognize(np.random.default_rng(0).integers(
            0, 256, (3, 32, 128, 3), dtype=np.uint8))
        assert len(out) == 3
        for text, conf, tag in out:
            assert tag == "lister"
            assert 0.0 <= conf <= 1.0
            assert isinstance(text, str)


class TestLevOCRInference:
    def test_recognize_runs(self):
        from advancedliteratemachinery_tpu.engine.infer import LevOCRInference
        from advancedliteratemachinery_tpu.models.abinet import (
            ABINetVisionConfig)
        from advancedliteratemachinery_tpu.models.levocr import (
            LevOCR, LevOCRConfig, LevtDictionary)

        cfg = LevOCRConfig(
            max_len=10, d_model=64, heads=2, ffn=128, layers=1, max_iter=1,
            vision=ABINetVisionConfig(max_length=8, num_classes=37,
                                      d_model=64, backbone_layers=1))
        model = LevOCR(cfg, policy=FP32_POLICY)
        d = LevtDictionary(max_len=cfg.max_len)
        tok = jnp.asarray(d.encode([""]))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 128, 3)), tok, tok,
                               train=False)
        eng = LevOCRInference(model, variables, input_dtype=jnp.float32)
        out = eng.recognize(np.random.default_rng(0).integers(
            0, 256, (2, 32, 128, 3), dtype=np.uint8))
        assert len(out) == 2
        assert all(tag == "levocr" for _, _, tag in out)

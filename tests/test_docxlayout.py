import jax
import jax.numpy as jnp
import numpy as np

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.dla import DLAConfig
from advancedliteratemachinery_tpu.models.docxlayout import (
    DocXLayout,
    DocXLayoutConfig,
    make_layout_predict_fn,
)

TINY = DocXLayoutConfig(
    dla=DLAConfig(levels=(1, 1, 1, 1, 1, 1), channels=(4, 8, 8, 16, 16, 32)),
    head_conv=16, top_k=8, top_k_sub=4, score_threshold=0.0)


class TestDocXLayout:
    def test_heads(self):
        model = DocXLayout(TINY, policy=FP32_POLICY)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(vars_, x)
        assert out["hm"].shape == (1, 16, 16, 1)
        assert out["cls"].shape == (1, 16, 16, 13)
        assert out["hm_sub"].shape == (1, 16, 16, 1)

    def test_infer_two_levels(self):
        model = DocXLayout(TINY, policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(1), x, method=model.infer)
        out = jax.jit(lambda v, x: model.apply(v, x, method=model.infer))(vars_, x)
        assert out["detections"].shape == (1, 8, 10)
        assert out["detections_sub"].shape == (1, 4, 10)
        assert out["cls_probs"].shape == (1, 8, 13)

    def test_pipeline_predict_fn(self):
        model = DocXLayout(TINY, policy=FP32_POLICY)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(1), x, method=model.infer)
        fn = make_layout_predict_fn(model, vars_)
        img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
        quads, scores, cats = fn(img)
        assert quads.shape[1] == 8
        assert len(scores) == len(cats) == len(quads)

        from advancedliteratemachinery_tpu.pipelines.modules import LayoutAnalysis

        la = LayoutAnalysis(fn)
        out = la(img)
        assert "layout_dets" in out and len(out["layout_dets"]) > 0
        assert "category_id" in out["layout_dets"][0]

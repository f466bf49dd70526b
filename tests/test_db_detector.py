import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.db import (
    DBConfig,
    DBDetector,
    extract_boxes,
)

TINY = DBConfig(width=8, fpn_dim=16, head_dim=8)


class TestDBDetector:
    def test_prob_map_full_res(self):
        model = DBDetector(TINY, policy=FP32_POLICY)
        x = jnp.zeros((1, 64, 96, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(vars_, x)
        assert out["prob"].shape == (1, 64, 96, 1)
        assert 0.0 <= float(out["prob"].min()) <= float(out["prob"].max()) <= 1.0

    def test_train_heads(self):
        model = DBDetector(TINY, policy=FP32_POLICY)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=True)
        out, _ = model.apply(vars_, x, train=True, mutable=["batch_stats"])
        assert set(out) == {"prob", "thresh", "binary"}

    def test_extract_boxes_finds_regions(self):
        prob = np.zeros((64, 96), np.float32)
        prob[10:20, 10:50] = 0.95   # text line 1
        prob[40:50, 20:80] = 0.9    # text line 2
        quads, scores = extract_boxes(prob)
        assert len(quads) == 2
        assert scores[0] >= scores[1] >= 0.6
        # first (highest score) box covers line 1 or 2 and extends beyond
        # the core region (unclip)
        xs = quads[0][0::2]
        assert xs.max() - xs.min() > 35

    def test_extract_boxes_empty(self):
        quads, scores = extract_boxes(np.zeros((32, 32), np.float32))
        assert quads.shape == (0, 8)

    def test_low_score_region_filtered(self):
        prob = np.full((32, 32), 0.0, np.float32)
        prob[5:15, 5:25] = 0.4  # above bin thresh but below box thresh
        quads, _ = extract_boxes(prob, bin_thresh=0.3, box_thresh=0.6)
        assert len(quads) == 0


class TestS2DStem:
    def test_s2d_stem_matches_plain_conv(self):
        """The space-to-depth stem reparameterization computes the SAME
        function as the 7x7/s2 conv (same (7,7,C,F) kernel parameter,
        scattered into a dense 4x4 s1 conv over 2x2-blocked input) — fp32
        op-level equality to rounding."""
        from advancedliteratemachinery_tpu.models.db import ConvBNRelu

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
        plain = ConvBNRelu(16, (7, 7), (2, 2), s2d=False,
                           policy=FP32_POLICY, name="stem")
        s2d = ConvBNRelu(16, (7, 7), (2, 2), s2d=True,
                         policy=FP32_POLICY, name="stem")
        v = plain.init(jax.random.PRNGKey(0), x)
        a = plain.apply(v, x)
        b = s2d.apply(v, x)          # identical param tree
        assert a.shape == b.shape == (2, 32, 48, 16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    def test_detector_param_tree_unchanged(self):
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        va = DBDetector(DBConfig(width=8, fpn_dim=16, head_dim=8,
                                 stem_s2d=False)).init(jax.random.PRNGKey(0), x)
        vb = DBDetector(DBConfig(width=8, fpn_dim=16, head_dim=8,
                                 stem_s2d=True)).init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(va) == jax.tree.structure(vb)
        assert jax.tree.map(lambda t: t.shape, va) == \
            jax.tree.map(lambda t: t.shape, vb)

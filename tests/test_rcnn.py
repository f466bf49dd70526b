"""Cascade R-CNN head (models/rcnn.py): detectron2-math fixtures for the
box transform / anchors / level assignment, numpy-oracle NMS, and an
end-to-end jitted smoke over a synthetic pyramid."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.rcnn import (
    CascadeConfig, CascadeRCNN, apply_deltas, assign_pyramid_level,
    base_anchors, grid_anchors, multilevel_roi_align)
from advancedliteratemachinery_tpu.ops.nms import box_nms


class TestBoxTransform:
    def test_identity_deltas(self):
        b = jnp.asarray([[2.0, 3.0, 10.0, 11.0]])
        out = apply_deltas(b, jnp.zeros((1, 4)), (1, 1, 1, 1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(b), atol=1e-5)

    def test_hand_fixture(self):
        # box (0,0,10,20): ctr (5,10), w 10, h 20. deltas (0.1, -0.2,
        # ln2, ln0.5) weights (1,1,1,1): new ctr (6, 6), w 20, h 10
        b = jnp.asarray([[0.0, 0.0, 10.0, 20.0]])
        d = jnp.asarray([[0.1, -0.2, math.log(2), math.log(0.5)]])
        out = np.asarray(apply_deltas(b, d, (1, 1, 1, 1)))[0]
        np.testing.assert_allclose(out, [6 - 10, 6 - 5, 6 + 10, 6 + 5],
                                   atol=1e-4)

    def test_weights_divide(self):
        b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        out = np.asarray(apply_deltas(b, d, (10, 10, 5, 5)))[0]
        # dx = 1/10 → ctr shifts by 1 (0.1 * w)
        np.testing.assert_allclose(out, [1, 0, 11, 10], atol=1e-4)

    def test_dw_clamp(self):
        b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        d = jnp.asarray([[0.0, 0.0, 50.0, 0.0]])
        out = np.asarray(apply_deltas(b, d, (1, 1, 1, 1)))[0]
        assert out[2] - out[0] == pytest.approx(10 * 1000 / 16, rel=1e-4)


class TestAnchors:
    def test_base_square(self):
        a = base_anchors(32, [1.0])
        np.testing.assert_allclose(a, [[-16, -16, 16, 16]], atol=1e-5)

    def test_base_aspect(self):
        a = base_anchors(32, [0.5])[0]
        w = a[2] - a[0]
        h = a[3] - a[1]
        assert w * h == pytest.approx(32 * 32, rel=1e-5)
        assert h / w == pytest.approx(0.5, rel=1e-5)

    def test_grid_layout(self):
        g = grid_anchors((2, 3), 4, 8, [1.0])
        assert g.shape == (6, 4)
        # anchor at cell (y=1, x=2): center (8, 4)
        np.testing.assert_allclose(g[5], [8 - 4, 4 - 4, 8 + 4, 4 + 4],
                                   atol=1e-5)


class TestLevelAssignment:
    def test_canonical_and_extremes(self):
        boxes = jnp.asarray([
            [0, 0, 224, 224],    # canonical → level 4 → idx 2
            [0, 0, 32, 32],      # tiny → clamped level 2 → idx 0
            [0, 0, 2000, 2000],  # huge → clamped level 5 → idx 3
            [0, 0, 112, 112],    # half → level 3 → idx 1
        ], jnp.float32)
        lvl = np.asarray(assign_pyramid_level(boxes))
        assert lvl.tolist() == [2, 0, 3, 1]


class TestBoxNMS:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        xy = rng.uniform(0, 50, (32, 2))
        wh = rng.uniform(5, 25, (32, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.uniform(0, 1, 32).astype(np.float32)

        def np_nms(boxes, scores, thr):
            idx = np.argsort(-scores)
            keep = []
            while len(idx):
                i = idx[0]
                keep.append(i)
                rest = idx[1:]
                x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
                y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
                x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
                y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
                inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
                a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                b = (boxes[rest, 2] - boxes[rest, 0]) * \
                    (boxes[rest, 3] - boxes[rest, 1])
                iou = inter / (a + b - inter)
                idx = rest[iou <= thr]
            return sorted(keep)

        want = np_nms(boxes, scores, 0.5)
        got = sorted(np.nonzero(np.asarray(
            box_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)))[0])
        assert list(got) == list(want)


class TestMultilevelPool:
    def test_level_selection(self):
        # constant-valued levels: the pooled value identifies the level
        feats = [jnp.full((1, 256 // s, 256 // s, 1), float(i))
                 for i, s in enumerate((4, 8, 16, 32))]
        boxes = jnp.asarray([[0, 0, 32, 32],      # → idx 0 (p2)
                             [8, 8, 232, 232],    # sqrt(area)=224 → idx 2
                             ], jnp.float32)
        out = np.asarray(multilevel_roi_align(feats, boxes, (4, 8, 16, 32), 2))
        assert out[0].mean() == pytest.approx(0.0, abs=1e-5)
        assert out[1].mean() == pytest.approx(2.0, abs=1e-5)


class TestCascadeEndToEnd:
    def test_jitted_inference_shapes(self):
        cfg = CascadeConfig(num_classes=3, pre_nms_topk=64, post_nms_topk=32,
                            detections_per_image=10, fc_dim=32)
        head = CascadeRCNN(cfg, policy=FP32_POLICY)
        rng = jax.random.PRNGKey(0)
        pyramid = {}
        for i, (name, s) in enumerate(zip(("p2", "p3", "p4", "p5", "p6"),
                                          (4, 8, 16, 32, 64))):
            pyramid[name] = jax.random.normal(
                jax.random.fold_in(rng, i), (1, 64 // s, 64 // s, 8)) * 0.5
        params = head.init(jax.random.PRNGKey(1), pyramid, (64, 64))["params"]
        out = jax.jit(lambda p, py: head.apply({"params": p}, py, (64, 64)))(
            params, pyramid)
        assert out["boxes"].shape == (10, 4)
        assert out["scores"].shape == (10,)
        assert out["classes"].shape == (10,)
        assert np.isfinite(np.asarray(out["boxes"])[np.asarray(out["valid"])]).all()
        # boxes inside the image
        b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
        if len(b):
            assert (b[:, 0] >= 0).all() and (b[:, 2] <= 64 + 1e-3).all()

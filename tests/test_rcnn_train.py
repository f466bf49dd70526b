"""Cascade R-CNN training losses (detectron2 semantics): box-delta
encode/decode roundtrip, IoU matching with low-quality matches,
fixed-shape subsampling, and the full RPN + 3-stage loss on a synthetic
pyramid — gradients flow and the loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.rcnn import (
    CascadeConfig,
    CascadeRCNN,
    apply_deltas,
    cascade_train_losses,
    encode_deltas,
    match_to_gt,
    pairwise_iou,
    subsample_labels,
)


class TestBoxMath:
    def test_encode_apply_roundtrip(self):
        rng = np.random.default_rng(0)
        src = np.sort(rng.uniform(0, 60, (16, 2, 2)), axis=1)
        src = np.concatenate([src[:, 0], src[:, 1] + 2], -1).astype(np.float32)
        tgt = src + rng.uniform(-3, 3, src.shape).astype(np.float32)
        tgt[:, 2:] = np.maximum(tgt[:, 2:], tgt[:, :2] + 1)
        for w in ((1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)):
            d = encode_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
            back = apply_deltas(jnp.asarray(src), d, w)
            np.testing.assert_allclose(np.asarray(back), tgt, atol=1e-3)

    def test_pairwise_iou_hand_case(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[0.0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]])
        iou = np.asarray(pairwise_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 1 / 3, 0.0], atol=1e-6)


class TestMatching:
    def test_thresholds_and_ignore_band(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10],     # IoU 1.0 → pos
                             [0.0, 0, 10, 16],     # IoU 0.625 → ignore
                             [40.0, 40, 50, 50]])  # IoU 0 → neg
        gt = jnp.asarray([[0.0, 0, 10, 10]])
        idx, labels = match_to_gt(boxes, gt, jnp.ones(1), 0.7, 0.3)
        np.testing.assert_array_equal(np.asarray(labels), [1, -1, 0])
        assert int(idx[0]) == 0

    def test_low_quality_match_rescues_best_anchor(self):
        # no anchor reaches 0.7, but the best one per GT becomes positive
        boxes = jnp.asarray([[0.0, 0, 10, 16], [40.0, 40, 50, 50]])
        gt = jnp.asarray([[0.0, 0, 10, 10]])
        _, plain = match_to_gt(boxes, gt, jnp.ones(1), 0.7, 0.3)
        _, lowq = match_to_gt(boxes, gt, jnp.ones(1), 0.7, 0.3,
                              allow_low_quality=True)
        assert int(plain[0]) == -1 and int(lowq[0]) == 1

    def test_invalid_gt_ignored(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10]])
        gt = jnp.asarray([[0.0, 0, 10, 10]])
        _, labels = match_to_gt(boxes, gt, jnp.zeros(1), 0.7, 0.3)
        assert int(labels[0]) == 0                  # nothing to match → neg


class TestSubsample:
    def test_counts_respected(self):
        labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 5)
        w = np.asarray(subsample_labels(labels, 16, 0.5,
                                        jax.random.PRNGKey(0)))
        assert w[np.asarray(labels) == -1].sum() == 0
        assert w[:10].sum() == 8                    # pos capped at num/2
        assert w.sum() == 16

    def test_few_positives_fill_with_negatives(self):
        labels = jnp.asarray([1] * 2 + [0] * 50)
        w = np.asarray(subsample_labels(labels, 16, 0.5,
                                        jax.random.PRNGKey(1)))
        assert w[:2].sum() == 2
        assert w.sum() == 16


TINY = CascadeConfig(num_classes=3, anchor_sizes=(8, 16, 32, 64, 128),
                     pre_nms_topk=64, post_nms_topk=32, fc_dim=32,
                     pooler_resolution=4)


def _pyramid(rng, C=16):
    return {f"p{i}": jax.random.normal(rng, (1, s, s, C))
            for i, s in zip(range(2, 7), (16, 8, 4, 2, 1))}


class TestCascadeTrainLosses:
    def test_losses_finite_and_decrease(self):
        head = CascadeRCNN(TINY, policy=FP32_POLICY)
        pyr = _pyramid(jax.random.PRNGKey(0))
        variables = head.init(jax.random.PRNGKey(1), pyr, (64, 64))
        gt_boxes = jnp.asarray([[8.0, 8, 30, 28], [34.0, 20, 60, 44],
                                [0.0, 0, 0, 0]])
        gt_classes = jnp.asarray([0, 2, 0], jnp.int32)
        gt_valid = jnp.asarray([1.0, 1.0, 0.0])

        def loss_fn(params, rng):
            m = head.apply({"params": params}, pyr, (64, 64), gt_boxes,
                           gt_classes, gt_valid, rng,
                           method=lambda mdl, *a: cascade_train_losses(
                               mdl, *a))
            return m["loss"], m

        (l0, m0), _ = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"], jax.random.PRNGKey(2))
        for k, v in m0.items():
            assert np.isfinite(float(v)), k
        assert {"rpn_cls", "rpn_loc", "stage0_cls", "stage1_cls",
                "stage2_cls", "stage2_loc"} <= set(m0)

        tx = optax.adam(1e-3)
        opt = tx.init(variables["params"])
        params = variables["params"]
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        losses = []
        for i in range(6):
            (l, _), g = grad_fn(params, jax.random.PRNGKey(100))
            upd, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, upd)
            losses.append(float(l))
        assert losses[-1] < losses[0]

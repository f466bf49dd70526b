"""WebRPG generative metrics vs hand-computed oracles.

Every expected value is worked out by hand with the reference formulas
(test_ele_iou.py compute_iou/__compute_elements_iou, test_sc.py
jaccard/weighted_sc, test_FID.py calculate_fid) so the implementations are
pinned to the published protocol, not to themselves.
"""

import numpy as np

from advancedliteratemachinery_tpu.eval.webrpg_metrics import (
    calculate_fid,
    elements_iou,
    elements_iou_single,
    jaccard,
    style_consistency,
    style_consistency_single,
    style_groups,
    webrpg_run_tests,
    xywh_center_iou,
)


class TestElementsIoU:
    def test_center_xywh_iou_hand_case(self):
        # box A center (5,5) size 10x10 → [0,10]^2; B center (10,5) 10x10
        # → [5,15]x[0,10]: inter 5*10=50, union 200-50=150 → 1/3
        a = np.array([[5.0, 5.0, 10.0, 10.0]])
        b = np.array([[10.0, 5.0, 10.0, 10.0]])
        np.testing.assert_allclose(xywh_center_iou(a, b), [1 / 3], atol=1e-12)

    def test_identical_boxes_iou_one(self):
        a = np.array([[3.0, 4.0, 2.0, 6.0]])
        np.testing.assert_allclose(xywh_center_iou(a, a), [1.0])

    def test_label_mismatch_scores_zero(self):
        boxes = np.array([[5.0, 5.0, 10.0, 10.0], [20.0, 20.0, 4.0, 4.0]])
        # element 0: same label, IoU 1; element 1: labels differ → 0
        got = elements_iou_single((boxes, [7, 8]), (boxes, [7, 9]))
        assert np.isclose(got, 0.5)

    def test_page_mean(self):
        b = np.array([[5.0, 5.0, 10.0, 10.0]])
        pages_pred = [(b, [1]), (b, [1])]
        shifted = np.array([[10.0, 5.0, 10.0, 10.0]])
        pages_gt = [(b, [1]), (shifted, [1])]
        # page 1: 1.0; page 2: 1/3 → mean 2/3
        assert np.isclose(elements_iou(pages_pred, pages_gt), 2 / 3)


class TestStyleConsistency:
    def test_style_groups_partitions_identical_rows(self):
        params = np.array([[1, 2], [3, 4], [1, 2], [5, 6]])
        mask = np.array([1, 1, 1, 0])     # last element masked out
        groups = style_groups(params, mask)
        assert groups == [{0, 2}, {1}]

    def test_jaccard(self):
        assert jaccard({1, 2}, {2, 3}) == 1 / 3
        assert jaccard(set(), set()) == 0.0

    def test_weighted_sc_hand_case(self):
        # GT groups {0,1} (w=2/3) and {2} (w=1/3);
        # pred groups {0,1,2}: J({0,1},{0,1,2})=2/3, J({2},{0,1,2})=1/3
        # → 2/3*2/3 + 1/3*1/3 = 5/9
        gt = [{0, 1}, {2}]
        pred = [{0, 1, 2}]
        assert np.isclose(style_consistency_single(gt, pred), 5 / 9)

    def test_perfect_grouping_scores_one(self):
        gt = [{0, 1}, {2, 3}]
        assert np.isclose(style_consistency_single(gt, gt), 1.0)
        assert np.isclose(style_consistency([gt], [gt]), 1.0)


class TestFID:
    def test_identical_sets_fid_zero(self):
        rng = np.random.default_rng(0)
        act = rng.standard_normal((64, 5))
        assert abs(calculate_fid(act, act)) < 1e-9

    def test_diagonal_gaussian_hand_case(self):
        # 1-D exact: act1 = [0, 2] (mu 1, var 2 ddof=1), act2 = [2, 4]
        # (mu 3, var 2). FID = (1-3)^2 + 2 + 2 - 2*sqrt(2*2) = 4.
        act1 = np.array([[0.0], [2.0]])
        act2 = np.array([[2.0], [4.0]])
        assert np.isclose(calculate_fid(act1, act2), 4.0, atol=1e-10)

    def test_mean_shift_only(self):
        # equal covariances cancel the trace term: FID = ||mu1 - mu2||^2
        rng = np.random.default_rng(1)
        act = rng.standard_normal((128, 4))
        shift = np.array([1.0, -2.0, 0.5, 0.0])
        got = calculate_fid(act, act + shift)
        assert np.isclose(got, float(np.sum(shift ** 2)), atol=1e-8)


class TestRunTestsHarness:
    def _records(self):
        rng = np.random.default_rng(2)
        recs = []
        for _ in range(3):
            E, P = 6, 9          # 4 layout cols + 5 style cols
            # sizes ≥ 1: the reference IoU scores zero-area boxes 0 even
            # against themselves, which would make "perfect" < 1.0
            gt = rng.integers(1, 50, (E, P)).astype(np.float64)
            recs.append({
                "pred": gt.copy(), "gt": gt,
                "element_mask": np.ones(E, np.int32),
                "unique_tids": np.arange(E),
            })
        return recs

    def test_perfect_predictions(self):
        recs = self._records()

        def feature_fn(params, rec):
            return params.mean(0)   # injected stand-in for FIDWebModel

        out = webrpg_run_tests(recs, feature_fn)
        assert np.isclose(out["elements_iou"], 1.0)
        assert np.isclose(out["style_consistency"], 1.0)
        for k in ("fid_overall", "fid_layout", "fid_style"):
            assert abs(out[k]) < 1e-9

    def test_layout_fid_ignores_style_corruption(self):
        recs = self._records()
        for r in recs:
            r["pred"] = r["gt"].copy()
            r["pred"][:, 4:] += 100.0   # corrupt style only

        def feature_fn(params, rec):
            return params.mean(0)

        out = webrpg_run_tests(recs, feature_fn)
        assert abs(out["fid_layout"]) < 1e-9       # style cols padded out
        assert out["fid_style"] > 1.0              # corruption visible
        assert np.isclose(out["elements_iou"], 1.0)

    def test_metrics_run_without_feature_fn(self):
        out = webrpg_run_tests(self._records())
        assert "fid_overall" not in out
        assert np.isclose(out["elements_iou"], 1.0)

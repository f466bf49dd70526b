"""COCO-protocol mAP evaluator vs hand-computed oracle fixtures.

The expected values below are worked out by hand with the exact COCOeval
rules (score-ordered greedy matching, 101-point interpolated precision
envelope, crowd matches ignored) — the same protocol detectron2's
COCOEvaluator applies to VGT (reference VGTTrainer.py:668-690).
"""

import numpy as np

from advancedliteratemachinery_tpu.eval.det_map import (
    coco_map,
    spotting_json_to_coco,
)


def _gt(img, cat, box, crowd=0):
    return {"image_id": img, "category_id": cat, "bbox": box,
            "iscrowd": crowd}


def _dt(img, cat, box, score):
    return {"image_id": img, "category_id": cat, "bbox": box, "score": score}


class TestCocoMap:
    def test_perfect_detections_ap_one(self):
        gts = [_gt(1, 1, [0, 0, 10, 10]), _gt(1, 1, [20, 0, 5, 5]),
               _gt(2, 1, [3, 3, 7, 7])]
        dts = [_dt(g["image_id"], 1, g["bbox"], 0.9) for g in gts]
        out = coco_map(dts, gts)
        assert np.isclose(out["mAP"], 1.0)
        assert np.isclose(out["AP50"], 1.0)
        assert np.isclose(out["AP75"], 1.0)

    def test_no_detections_ap_zero(self):
        gts = [_gt(1, 1, [0, 0, 10, 10])]
        out = coco_map([], gts)
        assert out["mAP"] == 0.0

    def test_hand_computed_mixed_case(self):
        """1 cat, 1 image: exact TP at IoU 1.0, one FP, one TP at IoU 2/3.

        thr ∈ {.50,.55,.60,.65}: matches = [TP, FP, TP]
          precision envelope [1, 2/3, 2/3], recalls [.5, .5, 1]
          AP = (51*1 + 50*(2/3)) / 101
        thr ∈ {.70....95}: matches = [TP, FP, FP]
          AP = 51/101
        """
        gts = [_gt(1, 1, [0, 0, 10, 10]), _gt(1, 1, [20, 20, 10, 10])]
        dts = [_dt(1, 1, [0, 0, 10, 10], 0.9),
               _dt(1, 1, [100, 100, 10, 10], 0.8),
               _dt(1, 1, [20, 22, 10, 10], 0.7)]   # IoU 80/120 = 2/3
        out = coco_map(dts, gts)
        ap_hi = (51 + 50 * (2 / 3)) / 101
        ap_lo = 51 / 101
        assert np.isclose(out["AP50"], ap_hi, atol=1e-9)
        assert np.isclose(out["AP75"], ap_lo, atol=1e-9)
        want = (4 * ap_hi + 6 * ap_lo) / 10
        assert np.isclose(out["mAP"], want, atol=1e-9)

    def test_crowd_matches_are_ignored(self):
        """A detection inside a crowd region is neither TP nor FP
        (pycocotools iscrowd semantics: IoU = inter/det-area)."""
        gts = [_gt(1, 1, [0, 0, 10, 10]),
               _gt(1, 1, [50, 50, 100, 100], crowd=1)]
        dts = [_dt(1, 1, [60, 60, 10, 10], 0.9),   # fully inside crowd
               _dt(1, 1, [0, 0, 10, 10], 0.8)]     # exact TP
        out = coco_map(dts, gts)
        assert np.isclose(out["mAP"], 1.0)

    def test_duplicate_detections_second_is_fp(self):
        """Each GT matches at most one detection (highest score wins)."""
        gts = [_gt(1, 1, [0, 0, 10, 10])]
        dts = [_dt(1, 1, [0, 0, 10, 10], 0.9),
               _dt(1, 1, [0, 0, 10, 10], 0.8)]
        out = coco_map(dts, gts)
        # [TP, FP]: envelope [1, .5]; recall hits 1.0 at the first det
        assert np.isclose(out["AP50"], 1.0)

    def test_per_category_mean_skips_empty_categories(self):
        gts = [_gt(1, 1, [0, 0, 10, 10]), _gt(1, 2, [20, 20, 10, 10])]
        dts = [_dt(1, 1, [0, 0, 10, 10], 0.9)]      # cat 2 missed entirely
        out = coco_map(dts, gts, categories=[1, 2, 3])
        assert np.isclose(out["AP@1"], 1.0)
        assert np.isclose(out["AP@2"], 0.0)
        assert "AP@3" not in out                     # no GT → excluded
        assert np.isclose(out["mAP"], 0.5)

    def test_max_dets_truncates_by_score(self):
        gts = [_gt(1, 1, [0, 0, 10, 10])]
        dts = [_dt(1, 1, [100, 100, 5, 5], 0.9),
               _dt(1, 1, [0, 0, 10, 10], 0.5)]      # dropped by max_dets=1
        out = coco_map(dts, gts, max_dets=1)
        assert out["mAP"] == 0.0


class TestSpottingBridge:
    def test_polys_to_xywh(self):
        res = [{"image_id": 7, "polys": [[2, 3], [12, 3], [12, 9], [2, 9]],
                "score": 0.8}]
        (d,) = spotting_json_to_coco(res)
        assert d["bbox"] == [2.0, 3.0, 10.0, 6.0]
        assert d["category_id"] == 1 and d["image_id"] == 7

    def test_bridge_feeds_map(self):
        gts = [_gt(7, 1, [2, 3, 10, 6])]
        dts = spotting_json_to_coco(
            [{"image_id": 7, "polys": [[2, 3], [12, 3], [12, 9], [2, 9]],
              "score": 0.8}])
        assert np.isclose(coco_map(dts, gts)["mAP"], 1.0)

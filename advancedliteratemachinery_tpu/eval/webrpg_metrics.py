"""WebRPG generative evaluation: element-IoU, style consistency, FID.

Parity targets (reference DocumentUnderstanding/WebRPG):
- test_ele_iou.py — per-element IoU between predicted and GT layout boxes
  (xywh center format) where the element tag-ids match, averaged per page
  then over pages.
- test_sc.py — style consistency: elements are grouped into sets sharing
  identical style-parameter rows; weighted max-Jaccard between GT groups
  and predicted groups, weighted by GT group size.
- test_FID.py — Fréchet distance between feature activations of GT and
  predicted render parameters, with three variants chained by
  run_tests.sh:40-59: overall / layout (style columns padded out) /
  style (bbox columns padded out). The torch FIDWebModel feature extractor
  is injected here as `feature_fn` (the metric itself is model-agnostic).

Records use the reference's per-page .pt schema: {"pred" [E, P],
"gt" [E, P], "element_mask" [E], "unique_tids" [E]} with the first 4
parameter columns the xywh layout and the rest style parameters.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np


# ---------------- element IoU (test_ele_iou.py) ----------------


def xywh_center_iou(box_1: np.ndarray, box_2: np.ndarray,
                    epsilon: float = 1e-10) -> np.ndarray:
    """[N, 4] center-xywh boxes → [N] IoU (test_ele_iou.py compute_iou)."""
    b1 = np.asarray(box_1, np.float64).reshape(-1, 4)
    b2 = np.asarray(box_2, np.float64).reshape(-1, 4)
    l1, t1 = b1[:, 0] - b1[:, 2] / 2, b1[:, 1] - b1[:, 3] / 2
    r1, bb1 = b1[:, 0] + b1[:, 2] / 2, b1[:, 1] + b1[:, 3] / 2
    l2, t2 = b2[:, 0] - b2[:, 2] / 2, b2[:, 1] - b2[:, 3] / 2
    r2, bb2 = b2[:, 0] + b2[:, 2] / 2, b2[:, 1] + b2[:, 3] / 2
    a1 = (r1 - l1) * (bb1 - t1)
    a2 = (r2 - l2) * (bb2 - t2)
    l_max, r_min = np.maximum(l1, l2), np.minimum(r1, r2)
    t_max, b_min = np.maximum(t1, t2), np.minimum(bb1, bb2)
    cond = (l_max < r_min) & (t_max < b_min)
    ai = np.where(cond, (r_min - l_max) * (b_min - t_max), 0.0)
    au = a1 + a2 - ai
    au = np.where(au > 0, au, epsilon)
    return np.clip(ai / au, 0.0, 1.0)


def elements_iou_single(pred: Tuple[np.ndarray, np.ndarray],
                        gt: Tuple[np.ndarray, np.ndarray]) -> float:
    """One page: (boxes [N,4], labels [N]) pairs; IoU counted only where
    labels agree, zero otherwise (test_ele_iou.py __compute_elements_iou)."""
    (bi, li), (bj, lj) = pred, gt
    N = len(bi)
    if N == 0:
        return 0.0
    same = np.asarray(li) == np.asarray(lj)
    ious = xywh_center_iou(np.asarray(bi), np.asarray(bj))
    return float(np.where(same, ious, 0.0).sum() / N)


def elements_iou(pred_layouts: Sequence, gt_layouts: Sequence) -> float:
    assert len(pred_layouts) == len(gt_layouts)
    if not pred_layouts:
        return 0.0
    return float(np.mean([elements_iou_single(p, g)
                          for p, g in zip(pred_layouts, gt_layouts)]))


# ---------------- style consistency (test_sc.py) ----------------


def style_groups(params: np.ndarray, mask: np.ndarray) -> List[Set[int]]:
    """Group element indices by identical style rows
    (test_sc.py get_unique_indices)."""
    n = int(np.sum(mask))
    rows = np.asarray(params)[:n]
    unique: List[Set] = []
    indices: List[Set[int]] = []
    for i, row in enumerate(rows):
        row_set = set(np.asarray(row).tolist())
        if row_set in unique:
            indices[unique.index(row_set)].add(i)
        else:
            unique.append(row_set)
            indices.append({i})
    return indices


def jaccard(a: Set, b: Set) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def style_consistency_single(gt_sets: List[Set[int]],
                             pred_sets: List[Set[int]]) -> float:
    """Weighted max-Jaccard of each GT group vs all predicted groups
    (test_sc.py weighted_sc_single; weights = GT group size)."""
    total = sum(len(s) for s in gt_sets)
    if total == 0:
        return 0.0
    score = 0.0
    for s in gt_sets:
        best = max((jaccard(s, p) for p in pred_sets), default=0.0)
        score += best * (len(s) / total)
    return score


def style_consistency(gt_pages: Sequence[List[Set[int]]],
                      pred_pages: Sequence[List[Set[int]]]) -> float:
    assert len(gt_pages) == len(pred_pages)
    if not gt_pages:
        return 0.0
    return float(np.mean([style_consistency_single(g, p)
                          for g, p in zip(gt_pages, pred_pages)]))


# ---------------- FID (test_FID.py) ----------------


def _matrix_sqrt(m: np.ndarray) -> np.ndarray:
    """Eigendecomposition square root (test_FID.py matrix_sqrt — abs of
    eigenvalues, general inverse)."""
    w, v = np.linalg.eig(m)
    return v @ np.diag(np.sqrt(np.abs(w))) @ np.linalg.inv(v)


def calculate_fid(act1: np.ndarray, act2: np.ndarray) -> float:
    """Fréchet distance between activation sets [N, D]
    (test_FID.py calculate_fid — sqrt(Σ1)·sqrt(Σ2) formulation)."""
    act1 = np.asarray(act1, np.float64)
    act2 = np.asarray(act2, np.float64)
    mu1, mu2 = act1.mean(0), act2.mean(0)
    s1 = np.cov(act1, rowvar=False)
    s2 = np.cov(act2, rowvar=False)
    s1 = np.atleast_2d(s1)
    s2 = np.atleast_2d(s2)
    ssdiff = float(np.sum((mu1 - mu2) ** 2))
    covmean = _matrix_sqrt(s1) @ _matrix_sqrt(s2)
    return float(np.real(ssdiff + np.trace(s1 + s2 - 2.0 * covmean)))


# ---------------- run_tests.sh-equivalent harness ----------------


def webrpg_run_tests(
    records: Sequence[Dict[str, np.ndarray]],
    feature_fn: Optional[Callable[[np.ndarray, Dict], np.ndarray]] = None,
    pad_value: int = 1992,
    layout_cols: int = 4,
) -> Dict[str, float]:
    """Chain all WebRPG metrics over per-page records
    (run_tests.sh:40-59: inference → FID ×3 → ele-IoU → SC).

    records: reference .pt schema dicts (see module docstring).
    feature_fn(params [E, P], record) → feature vector; injected in place
    of the torch FIDWebModel (FID_model.py FIDWebModel.forward). FID
    variants mask columns exactly like get_embeddings: layout pads the
    style columns to pad_value, style pads the bbox columns.
    """
    pred_layouts, gt_layouts = [], []
    gt_style_pages, pred_style_pages = [], []
    for r in records:
        n = int(np.sum(r["element_mask"]))
        pred_layouts.append((np.asarray(r["pred"])[:n, :layout_cols],
                             np.asarray(r["unique_tids"])[:n]))
        gt_layouts.append((np.asarray(r["gt"])[:n, :layout_cols],
                           np.asarray(r["unique_tids"])[:n]))
        gt_style_pages.append(style_groups(
            np.asarray(r["gt"])[:, layout_cols:], r["element_mask"]))
        pred_style_pages.append(style_groups(
            np.asarray(r["pred"])[:, layout_cols:], r["element_mask"]))

    out = {
        "elements_iou": elements_iou(pred_layouts, gt_layouts),
        "style_consistency": style_consistency(gt_style_pages,
                                               pred_style_pages),
    }
    if feature_fn is not None:
        for fid_type in ("overall", "layout", "style"):
            gt_act, pred_act = [], []
            for r in records:
                pred = np.array(r["pred"], np.float64, copy=True)
                gt = np.array(r["gt"], np.float64, copy=True)
                if fid_type == "layout":
                    pred[:, layout_cols:] = pad_value
                    gt[:, layout_cols:] = pad_value
                elif fid_type == "style":
                    pred[:, :layout_cols] = pad_value
                    gt[:, :layout_cols] = pad_value
                pred_act.append(np.asarray(feature_fn(pred, r)))
                gt_act.append(np.asarray(feature_fn(gt, r)))
            out[f"fid_{fid_type}"] = calculate_fid(np.stack(gt_act),
                                                   np.stack(pred_act))
    return out

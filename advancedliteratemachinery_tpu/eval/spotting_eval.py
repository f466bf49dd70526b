"""Spotting eval decode: token sequences → COCO-style result JSON.

Parity target: OmniParser engine/val.py:70 `decode_pred_seq` — the point
seq yields normalized center points, the polygon seq 16 normalized 2D
points, the rec seq a string + mean confidence; results are dicts
{image_id, pts, score, polys, rec} dumped as a JSON list for the external
spotting protocol.

Also: multi-prediction confidence ensembling (LISTER
multi_size_ensemble.py — per sample, take the prediction whose run had the
highest confidence).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from advancedliteratemachinery_tpu.codecs.coords import CoordSeqVocab


def decode_spotting_outputs(outputs: Dict[str, np.ndarray],
                            vocab: CoordSeqVocab,
                            image_id: str,
                            orig_size) -> List[Dict]:
    """outputs: the fixed-shape dict from OmniParser.infer_spotting
    (points [1,N,2] bin tokens, instance_valid [1,N], polygons [1,N,L],
    rec_tokens [1,N,Lr], rec_probs [1,N,Lr]) → list of result dicts."""
    h, w = orig_size
    nb = vocab.num_bins
    results = []
    valid = np.asarray(outputs["instance_valid"][0])
    points = np.asarray(outputs["points"][0], np.float64)
    polys = np.asarray(outputs["polygons"][0], np.float64)
    recs = np.asarray(outputs["rec_tokens"][0])
    probs = np.asarray(outputs["rec_probs"][0], np.float64)
    for i in range(len(valid)):
        if not valid[i]:
            continue
        px = points[i, 0] / nb * w
        py = points[i, 1] / nb * h
        poly = polys[i].reshape(-1, 2) / nb * [w, h]
        text = vocab.decode_text(recs[i])
        n_chars = max(len(text), 1)
        conf = float(np.prod(probs[i][:n_chars]) ** (1.0 / n_chars))
        results.append({
            "image_id": image_id,
            "pts": [[float(px), float(py)]],
            "score": conf,
            "polys": poly.tolist(),
            "rec": text,
        })
    return results


def confidence_ensemble(predictions: Sequence[Sequence[str]],
                        confidences: Sequence[Sequence[float]]) -> List[str]:
    """Per sample, pick the prediction from the run with the highest
    confidence (LISTER multi_size_ensemble.py). predictions[r][i] = run r,
    sample i."""
    n_runs = len(predictions)
    n = len(predictions[0])
    out = []
    for i in range(n):
        best = max(range(n_runs), key=lambda r: confidences[r][i])
        out.append(predictions[best][i])
    return out


def spotting_fscore(predictions, ground_truths, iou_thr: float = 0.5,
                    e2e: bool = False, case_sensitive: bool = False):
    """ICDAR/Total-Text-style spotting evaluation: greedy one-to-one
    quad-IoU matching at `iou_thr`; with `e2e` a match additionally
    requires transcription equality (the protocol behind OmniParser's
    Total-Text numbers — engine/val.py writes the prediction JSON this
    consumes).

    predictions / ground_truths: per-image dicts keyed by image id →
    list of {"polys": [4, 2] or flat [8] quad, "text"?: str}. GT entries
    with "ignore": True (ICDAR '###' don't-care regions) neither count as
    recall targets nor penalize matched detections.

    → {"precision", "recall", "hmean", "matched", "num_det", "num_gt"}.
    """
    import jax.numpy as jnp

    from advancedliteratemachinery_tpu.ops.nms import quad_iou

    def norm(s):
        s = s or ""
        return s if case_sensitive else s.lower()

    matched = 0
    num_det = 0
    num_gt = 0
    for img_id, gts in ground_truths.items():
        preds = predictions.get(img_id, [])
        care = [g for g in gts if not g.get("ignore", False)]
        ignore = [g for g in gts if g.get("ignore", False)]
        num_gt += len(care)

        def quads(items):
            if not items:
                return np.zeros((0, 4, 2), np.float32)
            return np.stack([np.asarray(it["polys"],
                                        np.float32).reshape(4, 2)
                             for it in items])

        pq = quads(preds)
        if len(pq) == 0:
            continue
        # drop detections inside don't-care regions before counting
        if len(ignore):
            iou_ign = np.asarray(quad_iou(jnp.asarray(pq)[:, None],
                                          jnp.asarray(quads(ignore))[None]))
            keep = iou_ign.max(axis=1) < iou_thr
            preds = [p for p, k in zip(preds, keep) if k]
            pq = pq[keep]
        num_det += len(pq)
        if not care or len(pq) == 0:
            continue
        iou = np.asarray(quad_iou(jnp.asarray(pq)[:, None],
                                  jnp.asarray(quads(care))[None]))
        taken = set()
        # greedy: best IoU pairs first (ICDAR one-to-one matching)
        order = np.dstack(np.unravel_index(np.argsort(-iou, axis=None),
                                           iou.shape))[0]
        used_pred = set()
        for pi, gi in order:
            if iou[pi, gi] < iou_thr:
                break
            if pi in used_pred or gi in taken:
                continue
            if e2e and norm(preds[pi].get("text")) != norm(
                    care[gi].get("text")):
                continue
            used_pred.add(int(pi))
            taken.add(int(gi))
            matched += 1
    precision = matched / num_det if num_det else 0.0
    recall = matched / num_gt if num_gt else 0.0
    hmean = (2 * precision * recall / (precision + recall)
             if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "hmean": hmean,
            "matched": matched, "num_det": num_det, "num_gt": num_gt}


def decode_vie_outputs(outputs: Dict[str, np.ndarray],
                       vocab: CoordSeqVocab,
                       class_names: Sequence[str],
                       orig_size) -> List[Dict]:
    """outputs: the fixed-shape dict from OmniParser.infer_vie → list of
    entity dicts, mirroring the reference's VIE result assembly
    (transformer.py:143-215 decode_vie_pt_poly_rec_seq): per class token,
    the text of its points, the class name, the class-token confidence and
    the per-point axis-aligned boxes from the 16-point polygon extremes.
    The period-3 pt masking makes every entity single-point; text joining
    with ' ' matches the reference's multi-crop ' '.join."""
    h, w = orig_size
    nb = vocab.num_bins
    base = vocab.vie_class_base
    valid = np.asarray(outputs["instance_valid"][0])
    polys = np.asarray(outputs["polygons"][0], np.float64)
    recs = np.asarray(outputs["rec_tokens"][0])
    classes = np.asarray(outputs["classes"][0])
    class_probs = np.asarray(outputs["class_probs"][0], np.float64)

    results = []
    for i in range(len(valid)):
        if not valid[i]:
            continue
        poly = polys[i].reshape(-1, 2)
        rect = [float(poly[:, 0].min() / nb * w),
                float(poly[:, 1].min() / nb * h),
                float(poly[:, 0].max() / nb * w),
                float(poly[:, 1].max() / nb * h)]
        ci = int(classes[i]) - base
        name = class_names[ci] if 0 <= ci < len(class_names) else str(ci)
        results.append({
            "text": " ".join([vocab.decode_text(recs[i])]),
            "class": name,
            "score": float(class_probs[i]),
            "rects": [rect],
        })
    return results

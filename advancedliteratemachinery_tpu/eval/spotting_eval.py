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

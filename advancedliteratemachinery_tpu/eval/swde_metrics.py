"""SWDE page-level attribute-extraction evaluation (GEM).

Behavioral parity target: DocumentUnderstanding/GEM/examples/fine_tuning/
run_swde/run.py:195 eval_on_one_website — per (page, xpath) node,
overlapping-window softmax probabilities are SUMMED then renormalized and
argmaxed into a node type prediction — followed by the page-level
constraint step (external eval_utils.page_level_constraint from the
MarkupLM base repo): each attribute may fire at most once per page, the
winner being the node with the highest probability for that attribute;
per-attribute precision/recall/F1 are computed over pages.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence, Tuple

import numpy as np


def aggregate_node_predictions(
    window_probs: Sequence[np.ndarray],
    window_infos: Sequence[Tuple[str, Sequence[int], Sequence[str],
                                 Sequence[str], Sequence[str]]],
) -> Dict[Tuple[str, str], Dict]:
    """Accumulate per-window first-token probabilities into per-node scores.

    window_probs: one [S, num_types] softmax array per window.
    window_infos: per window (page_id, first_token_positions, xpaths,
    truth_types, texts) — the run.py `info` tuple shape (run.py:236-256).
    Returns {(page_id, xpath): {"prob": [num_types] (normalized),
    "truth": str, "text": str}}.
    """
    acc: Dict[Tuple[str, str], Dict] = {}
    for probs, (page, positions, xpaths, truths, texts) in zip(
            window_probs, window_infos):
        for pos, xpath, truth, text in zip(positions, xpaths, truths, texts):
            key = (page, xpath)
            if key not in acc:
                acc[key] = {"prob": np.array(probs[pos], np.float64),
                            "truth": truth, "text": text}
            else:
                acc[key]["prob"] = acc[key]["prob"] + probs[pos]
                if acc[key]["truth"] != truth or acc[key]["text"] != text:
                    raise ValueError(f"inconsistent node info for {key}")
    for v in acc.values():
        v["prob"] = v["prob"] / v["prob"].sum()
    return acc


def page_level_metrics(
    node_preds: Mapping[Tuple[str, str], Dict],
    attributes: Sequence[str],
    none_label: str = "none",
) -> Dict[str, Dict[str, float]]:
    """Page-level constrained P/R/F1 per attribute + macro average.

    For each page and attribute, the single node with the highest
    (normalized) probability for that attribute among nodes argmax-
    predicted as it is the page's prediction; it is correct iff that
    node's ground truth equals the attribute. Recall denominators are
    pages whose gold contains the attribute.
    """
    types = [none_label] + [a for a in attributes if a != none_label]
    idx = {t: i for i, t in enumerate(types)}
    pages = sorted({page for page, _ in node_preds})

    out: Dict[str, Dict[str, float]] = {}
    f1s = []
    for attr in attributes:
        if attr == none_label:
            continue
        tp = fp = fn = 0
        for page in pages:
            nodes = {xp: v for (pg, xp), v in node_preds.items() if pg == page}
            has_gold = any(v["truth"] == attr for v in nodes.values())
            cands = [(v["prob"][idx[attr]], v) for v in nodes.values()
                     if int(np.argmax(v["prob"])) == idx[attr]]
            if cands:
                best = max(cands, key=lambda c: c[0])[1]
                if best["truth"] == attr:
                    tp += 1
                else:
                    fp += 1
                    if has_gold:
                        fn += 1
            elif has_gold:
                fn += 1
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[attr] = {"precision": prec, "recall": rec, "f1": f1}
        f1s.append(f1)
    out["macro"] = {"f1": float(np.mean(f1s)) if f1s else 0.0}
    return out

"""WebSRC span-QA evaluation (GEM run_websrc fine-tune).

Behavioral parity target: the WebSRC protocol the reference's
run_websrc/run.py predictions feed (SQuAD-style evaluation — the metric
code itself lives in the external WebSRC toolkit): per-question exact
match and token-level F1 over normalized answers, plus best-span
extraction from start/end logits with the standard constraints
(end >= start, bounded length, answerable region mask).
"""

from __future__ import annotations

import re
import string
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def normalize_answer(s: str) -> str:
    """SQuAD normalization: lowercase, strip punctuation/articles, fix
    whitespace."""
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def exact_match(pred: str, gold: str) -> float:
    return float(normalize_answer(pred) == normalize_answer(gold))


def token_f1(pred: str, gold: str) -> float:
    p = normalize_answer(pred).split()
    g = normalize_answer(gold).split()
    if not p or not g:
        return float(p == g)
    common = Counter(p) & Counter(g)
    n_same = sum(common.values())
    if n_same == 0:
        return 0.0
    precision = n_same / len(p)
    recall = n_same / len(g)
    return 2 * precision * recall / (precision + recall)


def best_span(start_logits: np.ndarray, end_logits: np.ndarray,
              max_answer_length: int = 30,
              answer_mask: Optional[np.ndarray] = None
              ) -> Tuple[int, int, float]:
    """Highest-scoring (start, end) with end >= start and bounded length;
    positions where answer_mask is 0 are excluded. Score = start_logit +
    end_logit (the standard BERT-QA decode)."""
    s = np.asarray(start_logits, np.float64)
    e = np.asarray(end_logits, np.float64)
    if answer_mask is not None:
        m = np.asarray(answer_mask) > 0
        s = np.where(m, s, -np.inf)
        e = np.where(m, e, -np.inf)
    L = len(s)
    score = s[:, None] + e[None, :]
    ii, jj = np.meshgrid(np.arange(L), np.arange(L), indexing="ij")
    valid = (jj >= ii) & (jj - ii < max_answer_length)
    score = np.where(valid, score, -np.inf)
    flat = int(np.argmax(score))
    i, j = divmod(flat, L)
    return i, j, float(score[i, j])


def evaluate_websrc(predictions: Dict[str, str],
                    golds: Dict[str, Sequence[str]]
                    ) -> Dict[str, float]:
    """predictions: qid → answer string; golds: qid → acceptable answers.
    Returns mean EM and F1 over all gold questions (missing predictions
    count as wrong)."""
    ems: List[float] = []
    f1s: List[float] = []
    for qid, answers in golds.items():
        pred = predictions.get(qid, "")
        ems.append(max((exact_match(pred, a) for a in answers), default=0.0))
        f1s.append(max((token_f1(pred, a) for a in answers), default=0.0))
    n = max(len(golds), 1)
    return {"exact_match": sum(ems) / n, "f1": sum(f1s) / n}

"""WebSRC span-QA metrics (GEM run_websrc protocol)."""

import numpy as np
import pytest

from advancedliteratemachinery_tpu.eval.websrc_metrics import (
    best_span, evaluate_websrc, exact_match, normalize_answer, token_f1)

pytestmark = pytest.mark.fast


def test_normalization():
    assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"
    assert exact_match("A cat.", "cat") == 1.0


def test_token_f1_partial():
    assert token_f1("red apple pie", "apple pie") == pytest.approx(0.8)
    assert token_f1("", "x") == 0.0
    assert token_f1("x", "x") == 1.0


def test_best_span_constraints():
    s = np.array([0.0, 5.0, 1.0, 0.0])
    e = np.array([0.0, 0.0, 4.0, 6.0])
    i, j, score = best_span(s, e)
    assert (i, j) == (1, 3)
    # length bound forces a shorter span
    i, j, _ = best_span(s, e, max_answer_length=2)
    assert (i, j) == (1, 2)
    # mask excludes the high-scoring end position
    i, j, _ = best_span(s, e, answer_mask=np.array([1, 1, 1, 0]))
    assert (i, j) == (1, 2)


def test_evaluate_multi_answer_and_missing():
    golds = {"q1": ["New York", "NYC"], "q2": ["42"]}
    preds = {"q1": "nyc"}
    m = evaluate_websrc(preds, golds)
    assert m["exact_match"] == pytest.approx(0.5)
    assert m["f1"] == pytest.approx(0.5)

"""SWDE page-level eval (GEM run_swde/run.py:195 + page-level constraint)."""

import numpy as np
import pytest

from advancedliteratemachinery_tpu.eval.swde_metrics import (
    aggregate_node_predictions, page_level_metrics)

pytestmark = pytest.mark.fast

# types: [none, title, author]
P = lambda *v: np.asarray(v, np.float64)


def test_aggregate_sums_overlapping_windows():
    probs1 = np.zeros((4, 3))
    probs1[2] = [0.2, 0.7, 0.1]
    probs2 = np.zeros((4, 3))
    probs2[0] = [0.6, 0.3, 0.1]
    infos = [("p1", [2], ["/html/a"], ["title"], ["Foo"]),
             ("p1", [0], ["/html/a"], ["title"], ["Foo"])]
    acc = aggregate_node_predictions([probs1, probs2], infos)
    node = acc[("p1", "/html/a")]
    np.testing.assert_allclose(node["prob"], [0.4, 0.5, 0.1])
    assert node["truth"] == "title"


def test_aggregate_rejects_inconsistent_truth():
    probs = np.ones((1, 3)) / 3
    infos = [("p1", [0], ["/x"], ["title"], ["a"]),
             ("p1", [0], ["/x"], ["author"], ["a"])]
    with pytest.raises(ValueError):
        aggregate_node_predictions([probs, probs], infos)


def _node(prob, truth, text="t"):
    return {"prob": np.asarray(prob, np.float64), "truth": truth,
            "text": text}


def test_page_constraint_picks_single_best_node():
    # two nodes both predicted "title" on one page; the higher-prob one is
    # wrong -> page counts as fp AND fn even though the other was right
    preds = {
        ("p1", "/a"): _node([0.1, 0.8, 0.1], "none"),
        ("p1", "/b"): _node([0.2, 0.6, 0.2], "title"),
    }
    m = page_level_metrics(preds, ["title", "author"])
    assert m["title"]["precision"] == 0.0
    assert m["title"]["recall"] == 0.0


def test_perfect_extraction():
    preds = {
        ("p1", "/a"): _node([0.1, 0.8, 0.1], "title"),
        ("p1", "/b"): _node([0.9, 0.05, 0.05], "none"),
        ("p2", "/a"): _node([0.2, 0.7, 0.1], "title"),
        ("p2", "/c"): _node([0.1, 0.1, 0.8], "author"),
    }
    m = page_level_metrics(preds, ["title", "author"])
    assert m["title"] == {"precision": 1.0, "recall": 1.0, "f1": 1.0}
    assert m["author"] == {"precision": 1.0, "recall": 1.0, "f1": 1.0}
    assert m["macro"]["f1"] == 1.0


def test_missed_gold_counts_as_fn():
    preds = {
        ("p1", "/a"): _node([0.9, 0.05, 0.05], "title"),  # gold but pred none
        ("p2", "/a"): _node([0.1, 0.8, 0.1], "title"),
    }
    m = page_level_metrics(preds, ["title", "author"])
    assert m["title"]["precision"] == 1.0
    assert m["title"]["recall"] == 0.5

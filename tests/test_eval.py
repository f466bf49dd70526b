import numpy as np
import pytest

from advancedliteratemachinery_tpu.eval.kie_metrics import (
    dict_to_tree,
    field_f1,
    flatten,
    normalize_dict,
    ntED,
)
from advancedliteratemachinery_tpu.eval.lore_metrics import (
    bbox_prf,
    logical_accuracy,
    quad_to_rect,
)
from advancedliteratemachinery_tpu.eval.ocr_metrics import (
    normalize_and_tokenize,
    token_metrics,
)
from advancedliteratemachinery_tpu.eval.str_metrics import (
    STRAccuracyCounter,
    benchmark_summary,
    fuse_predictions,
)
from advancedliteratemachinery_tpu.eval.teds import TEDS, extract_and_clean_tables
from advancedliteratemachinery_tpu.eval.tree_edit import (
    Node,
    tree_edit_distance,
    tree_size,
)


class TestTreeEdit:
    def test_identical_zero(self):
        t = Node("a", [Node("b"), Node("c", [Node("d")])])
        assert tree_edit_distance(t, t) == 0.0

    def test_single_rename(self):
        t1 = Node("a", [Node("b")])
        t2 = Node("a", [Node("x")])
        assert tree_edit_distance(t1, t2) == 1.0

    def test_insert_delete(self):
        t1 = Node("a")
        t2 = Node("a", [Node("b"), Node("c")])
        assert tree_edit_distance(t1, t2) == 2.0

    def test_known_zhang_shasha_example(self):
        # classic example: f(d(a c(b)) e) vs f(c(d(a b)) e) → distance 2
        t1 = Node("f", [Node("d", [Node("a"), Node("c", [Node("b")])]), Node("e")])
        t2 = Node("f", [Node("c", [Node("d", [Node("a"), Node("b")])]), Node("e")])
        assert tree_edit_distance(t1, t2) == 2.0

    def test_size(self):
        t = Node("a", [Node("b"), Node("c", [Node("d")])])
        assert tree_size(t) == 4


class TestTEDS:
    GT = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"

    def test_perfect(self):
        assert TEDS().evaluate(self.GT, self.GT) == pytest.approx(1.0)

    def test_cell_content_error_partial(self):
        pred = self.GT.replace(">a<", ">x<")
        s = TEDS().evaluate(pred, self.GT)
        assert 0.5 < s < 1.0

    def test_structure_only_ignores_content(self):
        pred = self.GT.replace(">a<", ">x<")
        assert TEDS(structure_only=True).evaluate(pred, self.GT) == pytest.approx(1.0)

    def test_missing_row_penalized(self):
        pred = "<table><tr><td>a</td><td>b</td></tr></table>"
        s = TEDS(structure_only=True).evaluate(pred, self.GT)
        assert s < 1.0

    def test_extract_tables(self):
        text = "bla\n<table>\n<tr> <td> a b </td></tr>\n</table>\nmore"
        out = extract_and_clean_tables(text)
        assert out == "<table><tr><td>ab</td></tr></table>"

    def test_garbage_pred_zero(self):
        assert TEDS().evaluate("no table here", self.GT) == 0.0


class TestKIE:
    def test_normalize_sorts_and_drops_empty(self):
        d = {"bb": "x", "a": "", "c": {"k": "v"}}
        n = normalize_dict(d)
        assert list(n.keys()) == ["a", "bb", "c"] or "a" not in n
        assert "a" not in n  # empty dropped

    def test_flatten(self):
        d = normalize_dict({"menu": [{"name": "cake", "cnt": "2"}]})
        pairs = flatten(d)
        assert ("name", "cake") in pairs and ("cnt", "2") in pairs

    def test_field_f1_perfect(self):
        gt = {"img1": {"total": "5.00", "date": "2024"}}
        assert field_f1(gt, gt) == pytest.approx(1.0, abs=1e-4)

    def test_field_f1_half(self):
        gt = {"img1": {"total": "5.00", "date": "2024"}}
        pred = {"img1": {"total": "5.00", "date": "1999"}}
        # tp=1, fn_or_fp=2 → 1/(1+1) = 0.5
        assert field_f1(pred, gt) == pytest.approx(0.5, abs=1e-4)

    def test_nted_perfect_and_degraded(self):
        gt = {"menu": [{"name": "cake"}], "total": "5"}
        assert ntED(gt, gt) == pytest.approx(1.0)
        assert ntED({}, gt) == pytest.approx(0.0)
        partial = ntED({"total": "5"}, gt)
        assert 0.0 < partial < 1.0


class TestOcrMetrics:
    def test_tokenize(self):
        assert normalize_and_tokenize("Hello  World\n###") == ["hello", "world"]
        assert normalize_and_tokenize("ab c", word_level=False) == ["a", "b", "c"]

    def test_perfect(self):
        m = token_metrics({"a": "the cat"}, {"a": "The cat"})
        assert m["micro_f1_score"] == pytest.approx(1.0, abs=1e-6)

    def test_partial(self):
        m = token_metrics({"a": "the dog"}, {"a": "the cat"})
        assert m["micro_recall"] == pytest.approx(0.5, abs=1e-6)


class TestSTRMetrics:
    def test_counter(self):
        c = STRAccuracyCounter()
        assert c.add("Hello", "hello")  # case-insensitive
        assert not c.add("hell", "hello")
        assert c.accuracy == 0.5

    def test_summary_weighted(self):
        a = STRAccuracyCounter(); a.add("x", "x")
        b = STRAccuracyCounter()
        for _ in range(3):
            b.add("y", "z")
        s = benchmark_summary({"A": a, "B": b})
        assert s["total_accuracy"] == pytest.approx(0.25)

    def test_fusion_picks_highest_confidence(self):
        cands = [[("wrong", 0.3, "char"), ("right", 0.9, "bpe")]]
        out = fuse_predictions(cands, ["right"])
        assert out["fused"] == 1.0
        assert out["char"] == 0.0 and out["bpe"] == 1.0

    def test_length_uniform(self):
        c = STRAccuracyCounter()
        c.add("ab", "ab")          # len 2: 1/1
        c.add("abcd", "abcz")      # len 4: 0/1
        assert c.length_uniform_accuracy() == pytest.approx(0.5)


class TestLoreMetrics:
    def test_quad_to_rect(self):
        assert quad_to_rect([0, 0, 4, 0, 4, 4, 0, 4]) == (0, 0, 4, 4)

    def test_bbox_prf(self):
        gt = [(0, 0, 4, 4), (10, 10, 14, 14)]
        pred = [(0.2, 0, 4, 4), (30, 30, 34, 34)]
        m = bbox_prf(pred, gt)
        assert m["tp"] == 1
        assert m["recall"] == pytest.approx(0.5)
        assert m["precision"] == pytest.approx(0.5)

    def test_logical_accuracy(self):
        gt_r = [(0, 0, 4, 4), (10, 10, 14, 14)]
        pr_r = [(0, 0, 4, 4), (10, 10, 14, 14)]
        gt_ax = [[0, 0, 0, 0], [1, 1, 2, 2]]
        pr_ax = [[0, 0, 0, 0], [1, 1, 2, 3]]  # second wrong
        assert logical_accuracy(pr_r, pr_ax, gt_r, gt_ax) == pytest.approx(0.5)


class TestVIEEvaluation:
    def test_entities_to_dict_accumulates(self):
        from advancedliteratemachinery_tpu.eval.kie_metrics import (
            vie_entities_to_dict)
        ents = [{"text": "a", "class": "menu.nm"},
                {"text": "b", "class": "menu.price"},
                {"text": "c", "class": "menu.nm"}]
        assert vie_entities_to_dict(ents) == {
            "menu.nm": ["a", "c"], "menu.price": ["b"]}

    def test_evaluate_vie_perfect_and_partial(self):
        from advancedliteratemachinery_tpu.eval.kie_metrics import (
            evaluate_vie)
        gt = {"img0": {"company": ["Acme"], "total": ["9.99"]}}
        perfect = {"img0": [{"text": "Acme", "class": "company"},
                            {"text": "9.99", "class": "total"}]}
        m = evaluate_vie(perfect, gt)
        assert m["field_f1"] == pytest.approx(1.0, abs=1e-4)
        assert m["ntED_acc"] == pytest.approx(1.0)
        # one of two fields right: tp=1, fn_or_fp = 1 (bad pred) + 1
        # (missed gt) → f1 = 1 / (1 + 1) = 0.5
        half = {"img0": [{"text": "Acme", "class": "company"},
                         {"text": "0.00", "class": "total"}]}
        m = evaluate_vie(half, gt)
        assert m["field_f1"] == pytest.approx(0.5, abs=1e-4)
        assert 0.0 < m["ntED_acc"] < 1.0

    def test_missing_image_scores_zero(self):
        from advancedliteratemachinery_tpu.eval.kie_metrics import (
            evaluate_vie)
        gt = {"img0": {"company": ["Acme"]}}
        m = evaluate_vie({}, gt)
        assert m["field_f1"] == pytest.approx(0.0, abs=1e-4)
        assert m["ntED_acc"] == pytest.approx(0.0)

import json

import numpy as np
import pytest

from advancedliteratemachinery_tpu.eval.ccocr_harness import (
    EVALUATOR_MAP,
    KieEvaluator,
    OcrEvaluator,
    ParsingEvaluator,
    evaluate_and_summary,
    load_response_from_dir,
)
from advancedliteratemachinery_tpu.pipelines.proctag import (
    ProcTagProcessor,
    parse_tags,
    space_layout,
    threshold_cluster,
)


class TestCcocrHarness:
    def test_ocr_evaluator_protocol(self):
        ev = OcrEvaluator("multi_scene_ocr")
        meta, result = ev({"img1": "the cat"}, {"img1": "the cat", "img2": "dog"},
                          dataset="IC15")
        assert meta["gt_total_num"] == 2
        assert "img2" in meta["response_error_list"]
        assert result["summary"]["macro_f1_score"] > 0
        assert 0 < result["summary"]["response_success_ratio"] <= 1

    def test_kie_evaluator_markdown_fences(self):
        ev = KieEvaluator("kie")
        pred = '```json\n{"total": "5.00"}\n```'
        meta, result = ev({"a": pred}, {"a": {"total": "5.00"}})
        assert result["summary"]["f1_score"] == pytest.approx(1.0, abs=1e-4)
        assert result["summary"]["nted_acc"] == pytest.approx(1.0)

    def test_kie_bad_json_counted_as_post_error(self):
        ev = KieEvaluator("kie")
        meta, _ = ev({"a": "not json at all"}, {"a": {"x": "1"}})
        assert meta["post_error_list"] == ["a"]

    def test_parsing_evaluator(self):
        gt = "<table><tr><td>a</td></tr></table>"
        ev = ParsingEvaluator("doc_parsing")
        _, res = ev({"t": f"text {gt} text"}, {"t": gt})
        assert res["summary"]["teds"] == pytest.approx(1.0)

    def test_summary_over_index(self):
        index = [{"dataset": "setA", "group": "multi_scene_ocr"},
                 {"dataset": "setB", "group": "kie"}]
        responses = {"setA": {"i": "hello world"},
                     "setB": {"j": '{"k": "v"}'}}
        gts = {"setA": {"i": "hello world"}, "setB": {"j": {"k": "v"}}}
        info = evaluate_and_summary(index, responses, gts)
        assert info["_overall"]["score"] == pytest.approx(1.0, abs=1e-4)
        assert info["_overall"]["datasets"] == 2

    def test_load_response_dir(self, tmp_path):
        (tmp_path / "img1.txt").write_text("hello")
        (tmp_path / "img2.json").write_text(json.dumps({"response": "world"}))
        out = load_response_from_dir(str(tmp_path))
        assert out == {"img1": "hello", "img2": "world"}


class TestProcTag:
    def test_space_layout_lines_and_gaps(self):
        texts = ["Name:", "John", "Total:", "5.00"]
        boxes = [[0, 0, 40, 0, 40, 10, 0, 10], [80, 0, 120, 0, 120, 10, 80, 10],
                 [0, 20, 44, 20, 44, 30, 0, 30], [80, 20, 115, 20, 115, 30, 80, 30]]
        layout = space_layout(texts, boxes)
        lines = layout.split("\n")
        assert len(lines) == 2
        assert lines[0].startswith("Name:") and "John" in lines[0]
        assert lines[0].index("John") > 5  # proportional gap

    def test_parse_tags(self):
        assert parse_tags('["Locate Field", "Sum"]') == ["locate field", "sum"]
        assert parse_tags("locate, sum") == ["locate", "sum"]

    def test_threshold_cluster(self):
        emb = np.asarray([[1, 0], [0.99, 0.05], [0, 1.0]])
        ids = threshold_cluster(emb, 0.9)
        assert ids[0] == ids[1] != ids[2]

    def test_end_to_end_sampling(self):
        def llm(prompt):
            assert "Document layout" in prompt
            return '["locate", "sum"]' if "total" in prompt else '["locate"]'

        def embed(texts):
            # map distinct tags to orthogonal axes
            vocab = {t: i for i, t in enumerate(sorted(set(texts)))}
            out = np.zeros((len(texts), len(vocab) + 1))
            for i, t in enumerate(texts):
                out[i, vocab[t]] = 1.0
            return out

        p = ProcTagProcessor(llm, embed)
        texts = ["Total: 5"]
        boxes = [[0, 0, 40, 0, 40, 10, 0, 10]]
        tags1 = p.generate_proctags(texts, boxes, "what is the total?")
        tags2 = p.generate_proctags(texts, boxes, "what is the name?")
        assert tags1 == ["locate", "sum"]
        chosen = p.complexity_first_diverse_sampling([tags1, tags2, tags2], 2)
        assert chosen[0] == 0  # most complex (2 clusters) first
        assert len(chosen) == 2

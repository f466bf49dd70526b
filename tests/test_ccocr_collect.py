"""CC-OCR prediction collection (reference Benchmarks/CC-OCR/example.py):
index → qa.jsonl walk → per-image response JSONs → evaluator harness.

Covers: output layout/naming (basename(url)+'.json' as in example.py),
resume skipping, failure tolerance, unreleased-dataset filtering, and the
end-to-end chain collect → load_response_from_dir → evaluate_and_summary.
"""

import json
import os

import pytest

from advancedliteratemachinery_tpu.eval.ccocr_harness import (
    OcrEvaluator,
    collect_predictions,
    evaluate_and_summary,
    load_response_from_dir,
)


@pytest.fixture()
def bench_tree(tmp_path):
    """CC-OCR-format tree: base/data/setA/{qa.jsonl, images/}."""
    data_dir = tmp_path / "data" / "setA"
    (data_dir / "images").mkdir(parents=True)
    qa = []
    for i, text in enumerate(["hello world", "foo bar"]):
        img = data_dir / "images" / f"im{i}.jpg"
        img.write_bytes(b"\xff\xd8fake")
        qa.append({"url": f"images/im{i}.jpg",
                   "prompt": "Read all text in the image."})
    with open(data_dir / "qa.jsonl", "w") as f:
        for rec in qa:
            f.write(json.dumps(rec) + "\n")
    index = [{"dataset": "setA", "group": "multi_scene_ocr",
              "base_dir": "data/setA"},
             {"dataset": "unreleased", "group": "multi_scene_ocr",
              "base_dir": "data/none", "release": False}]
    return tmp_path, index


def test_collect_layout_and_eval_chain(bench_tree):
    base, index = bench_tree
    gold = {"im0.jpg": "hello world", "im1.jpg": "foo bar"}

    def model_fn(image_path, question):
        assert question.startswith("Read")
        return gold[os.path.basename(image_path)]

    out_dir = base / "preds"
    stats = collect_predictions(index, str(base), str(out_dir), model_fn,
                                model_name="oracle", workers=2)
    assert stats == {"setA": {"total": 2, "ok": 2, "skipped": 0}}
    # example.py naming: basename(url path) + ".json"
    written = sorted(os.listdir(out_dir / "oracle" / "setA"))
    assert written == ["im0.jpg.json", "im1.jpg.json"]
    rec = json.loads((out_dir / "oracle" / "setA" / "im0.jpg.json")
                     .read_text())
    assert rec["response"] == "hello world"
    assert rec["model_name"] == "oracle"
    assert set(rec) >= {"image", "question", "response", "time"}

    # the written directory is directly consumable by the harness
    responses = load_response_from_dir(str(out_dir / "oracle" / "setA"))
    meta, result = OcrEvaluator("multi_scene_ocr")(responses, gold)
    assert result["summary"]["macro_f1_score"] == pytest.approx(1.0)

    info = evaluate_and_summary([index[0]], {"setA": responses},
                                {"setA": gold})
    assert info["_overall"]["score"] == pytest.approx(1.0)


def test_collect_resume_and_failures(bench_tree):
    base, index = bench_tree
    out_dir = base / "preds"
    calls = []

    def flaky(image_path, question):
        calls.append(image_path)
        if image_path.endswith("im1.jpg"):
            raise RuntimeError("transient")
        return "ok"

    stats = collect_predictions(index, str(base), str(out_dir), flaky,
                                model_name="m", workers=1)
    assert stats["setA"] == {"total": 2, "ok": 1, "skipped": 0}

    # resume fills only the failed gap
    stats = collect_predictions(index, str(base), str(out_dir),
                                lambda p, q: "recovered",
                                model_name="m", workers=1)
    assert stats["setA"] == {"total": 2, "ok": 1, "skipped": 1}
    rec = json.loads((out_dir / "m" / "setA" / "im1.jpg.json").read_text())
    assert rec["response"] == "recovered"

    # resume=False recomputes everything
    stats = collect_predictions(index, str(base), str(out_dir),
                                lambda p, q: "v2", model_name="m",
                                workers=1, resume=False)
    assert stats["setA"] == {"total": 2, "ok": 2, "skipped": 0}


def _echo_model(image_path, question):
    """import: target for the CLI test."""
    return "echoed:" + os.path.basename(image_path)


def test_cli_ccocr_collect_import_model(bench_tree, monkeypatch):
    base, index = bench_tree
    index_path = base / "index" / "all.json"
    index_path.parent.mkdir()
    index_path.write_text(json.dumps(index))
    out_dir = base / "cli_preds"

    from advancedliteratemachinery_tpu.cli import main

    # index grandparent == base → reference-style path resolution
    rc = main(["ccocr-collect", str(index_path), str(out_dir),
               "--model", "import:test_ccocr_collect:_echo_model",
               "--model-name", "echo", "--workers", "1"])
    assert rc == 0
    responses = load_response_from_dir(str(out_dir / "echo" / "setA"))
    assert responses == {"im0.jpg": "echoed:im0.jpg",
                         "im1.jpg": "echoed:im1.jpg"}

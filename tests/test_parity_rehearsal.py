"""Parity-rehearsal kit (VERDICT r4 item 6): each priority family's
documented released-weights command (docs/PARITY.md) smoke-run
END-TO-END on fixture checkpoints — the exact CLI line, through the real
torch loader + importer + eval harness, to a metric JSON. The day real
weights exist, the rehearsal is the same one-liner minus --config-json
(fixture checkpoints are reduced-dimension; the released command uses
the default released configs).

Zero-egress note: numbers here are garbage (random fixture weights) —
these tests assert the COMMAND PATH, not accuracy. Accuracy parity
itself requires the released .pth files (BASELINE.md table)."""

import dataclasses
import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from advancedliteratemachinery_tpu import cli

GOLDEN = "tests/golden"


def _run_cli(capsys, argv):
    rc = cli.main(argv)
    assert rc == 0
    return capsys.readouterr().out


class TestStrRehearsals:
    """`cli eval` — benchmark_all_eval over LMDB sets (reference
    OCR/MGP-STR/test_final.py:29, LISTER test.py:23, LevOCR eval.py:21).
    README targets: MGP-STR 93.4 / LISTER 93.6 / LevOCR 92.9 avg."""

    @pytest.fixture()
    def lmdb_dir(self, tmp_path):
        sys.path.insert(0, "tests")
        from test_fit import TEXTS, _render_word_lmdb
        return _render_word_lmdb(tmp_path, "eval_set", TEXTS[:8])

    def test_mgp_str(self, capsys, lmdb_dir):
        import test_checkpoint_import as M
        cfg_json = json.dumps({
            "batch_max_length": M.T - 2, "bpe_vocab_size": 64,
            "wp_vocab_size": 64,
            "vit": {"embed_dim": M.D, "depth": M.DEPTH,
                    "num_heads": M.HEADS}})
        out = _run_cli(capsys, [
            "eval", "--model", "mgp_str", "--variant", "tiny",
            "--torch-ckpt", f"{GOLDEN}/mgp_str.pth",
            "--data", lmdb_dir, "--batch-max-length", str(M.T - 2),
            "--batch-size", "8", "--config-json", cfg_json])
        res = json.loads(out)
        assert "total_accuracy" in res and "total_samples" in res

    def test_lister(self, capsys, lmdb_dir):
        from advancedliteratemachinery_tpu.models.focalnet import (
            FOCALNET_VARIANTS, FocalNetConfig)
        from advancedliteratemachinery_tpu.models.lister import LISTERConfig

        # the fixture checkpoint's focalnet dims (golden_common.run_lister)
        FOCALNET_VARIANTS.setdefault("import_tiny", FocalNetConfig(
            embed_dim=8, depths=(1, 1, 1, 1), drop_path_rate=0.0,
            layerscale_value=1e-2))
        cfg = LISTERConfig(variant="import_tiny", max_ch=6, iters=1,
                           nhead=2, window_size=5, drop_path_rate=0.0)
        out = _run_cli(capsys, [
            "eval", "--model", "lister",
            "--torch-ckpt", f"{GOLDEN}/lister.pth",
            "--data", lmdb_dir, "--batch-size", "8",
            "--config-json", json.dumps(cfg.to_dict())])
        res = json.loads(out)
        assert "total_accuracy" in res

    def test_levocr(self, capsys, lmdb_dir):
        import test_levocr_import as M
        cfg_json = json.dumps({
            "max_len": M.MAXLEN, "d_model": M.DL, "heads": 2, "ffn": 64,
            "layers": 1,
            "vision": {"max_length": 6, "num_classes": 37,
                       "d_model": M.DV, "ffn": 256}})
        out = _run_cli(capsys, [
            "eval", "--model", "levocr",
            "--torch-ckpt", f"{GOLDEN}/levocr.pth",
            "--data", lmdb_dir, "--batch-size", "8",
            "--config-json", cfg_json])
        res = json.loads(out)
        assert "total_accuracy" in res


class TestVgtRehearsal:
    """`cli pdf-grid` → `cli layout` → `cli eval-det` (reference
    VGT/inference.py + COCOEvaluator). README target: PubLayNet mAP
    96.2."""

    def test_layout_then_eval_det(self, capsys, tmp_path):
        import jax.numpy as jnp  # noqa: F401 — ensure jax present
        import test_vgt_import as V
        from PIL import Image
        from test_vgt_import import TestCascadeImport

        # fixture checkpoint: golden backbone sd + mirror cascade head
        bb_sd = torch.load(f"{GOLDEN}/vgt.pth", map_location="cpu",
                           weights_only=False)
        if "model" in bb_sd:
            bb_sd = bb_sd["model"]
        r, fc, K = 3, 24, 4
        head_sd, _ = TestCascadeImport._torch_head_sd(None, V.FPN_DIM, r,
                                                      fc, K)
        sd = {**{k: np.asarray(v) for k, v in bb_sd.items()},
              **head_sd}
        ckpt = tmp_path / "vgt_full.pth"
        torch.save({k: torch.as_tensor(np.asarray(v))
                    for k, v in sd.items()}, ckpt)

        page = tmp_path / "page.png"
        Image.new("RGB", (200, 200), "white").save(page)

        cfg_json = json.dumps({
            "img_size": [64, 64], "patch_size": 16, "embed_dim": V.D,
            "self_depth": V.DEPTH, "cross_depth": 0, "num_heads": V.H,
            "grid_embedding_dim": V.GDIM, "vocab_size": V.VOCAB,
            "out_indices": list(V.OUT_IDX), "fpn_dim": V.FPN_DIM})
        cascade_json = json.dumps({
            "num_classes": K, "pre_nms_topk": 32, "post_nms_topk": 16,
            "detections_per_image": 8, "fc_dim": fc,
            "pooler_resolution": r, "score_thresh": 0.0})
        dets = tmp_path / "dets.json"
        _run_cli(capsys, [
            "layout", str(page), "--torch-ckpt", str(ckpt),
            "--image-size", "64", "--config-json", cfg_json,
            "--cascade-json", cascade_json, "--out", str(dets)])
        det_list = json.loads(dets.read_text())
        assert isinstance(det_list, list)

        gt = tmp_path / "gt.json"
        gt.write_text(json.dumps([
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 40]}]))
        out = _run_cli(capsys, ["eval-det", str(dets), str(gt)])
        res = json.loads(out)
        assert "mAP" in res and "AP50" in res


class TestGeoLayoutLMRehearsal:
    """`cli preprocess-funsd` → `cli eval-funsd` (reference
    GeoLayoutLM evaluate.py). README target: FUNSD SER F1 92.32 /
    RE F1 89.23."""

    def test_eval_funsd(self, capsys, tmp_path):
        import test_geolayoutlm_import as G

        torch.manual_seed(3)
        tm = G.TVIE().eval()
        # the full VIE batch carries line-rank ids, so the model's SER head
        # takes [text_mm ; inner-rank-emb] (2H — reference
        # geolayoutlm_vie.py:38/:134 concat); the import-test mirror's
        # simplified H-wide head predates that input
        tm.bio_classifier = torch.nn.Linear(2 * G.H, 5)
        ckpt = tmp_path / "geolayoutlm_vie.pth"
        torch.save(tm.state_dict(), ckpt)

        page = {
            "blocks": {"first_token_idx_list": [1, 3],
                       "boxes": [[10, 10, 40, 20], [50, 10, 90, 20]]},
            "words": [
                {"text": "to:", "tokens": [5, 6],
                 "boundingBox": [[10, 10], [40, 10], [40, 20], [10, 20]]},
                {"text": "john", "tokens": [7],
                 "boundingBox": [[50, 10], [70, 10], [70, 20], [50, 20]]},
                {"text": "doe", "tokens": [8, 9],
                 "boundingBox": [[72, 10], [90, 10], [90, 20], [72, 20]]},
            ],
            "parse": {"class": {"HEADER": [], "QUESTION": [[0]],
                                "ANSWER": [[1, 2]]},
                      "relations": [[0, 1]]},
            "meta": {"width": 100, "height": 100},
        }
        data = tmp_path / "preprocessed"
        data.mkdir()
        (data / "page0.json").write_text(json.dumps(page))

        cfg = dataclasses.asdict(G.CFG)
        cfg["image_size"] = 64          # the fixture backbone's pos grid
        out = _run_cli(capsys, [
            "eval-funsd", str(data), "--torch-ckpt", str(ckpt),
            "--config-json", json.dumps(cfg),
            "--max-seq", "16", "--max-blocks", "3", "--cls-id", "59"])
        res = json.loads(out)
        assert "ser" in res and "f1" in res["ser"]
        assert "re" in res and res["pages"] == 1

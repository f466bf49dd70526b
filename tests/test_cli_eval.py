"""`eval` and `ccocr-eval` CLI commands — the reference's primary
evaluation entry points (OCR/MGP-STR/test_final.py benchmark_all_eval;
Benchmarks/CC-OCR/evaluation/main.py) exposed on the unified CLI."""

import io
import json
import sys

import numpy as np
from PIL import Image

from advancedliteratemachinery_tpu.data.lmdb_writer import write_lmdb


def _make_lmdb(tmp_path, name, labels):
    data = {b"num-samples": str(len(labels)).encode()}
    for i, label in enumerate(labels, start=1):
        img = Image.fromarray(np.random.default_rng(i).integers(
            0, 255, (20, 60, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        data[b"image-%09d" % i] = buf.getvalue()
        data[b"label-%09d" % i] = label.encode()
    d = tmp_path / name
    d.mkdir()
    write_lmdb(str(d / "data.mdb"), data)
    return str(d)


class TestEvalCli:
    def test_benchmark_suite_runs(self, tmp_path, monkeypatch):
        from advancedliteratemachinery_tpu import cli

        d1 = _make_lmdb(tmp_path, "IIIT5k", ["cat", "dog"])
        d2 = _make_lmdb(tmp_path, "SVT", ["sun"])
        buf = io.StringIO()
        monkeypatch.setattr(sys, "stdout", buf)
        rc = cli.main(["eval", "--data", d1, d2, "--model", "mgp_str",
                       "--variant", "tiny", "--batch-size", "4",
                       "--batch-max-length", "6"])
        sys.stdout = sys.__stdout__
        assert rc == 0
        out = json.loads(buf.getvalue())
        assert set(out) >= {"IIIT5k", "SVT", "total_accuracy",
                            "total_samples"}
        assert out["total_samples"] == 3
        assert 0.0 <= out["total_accuracy"] <= 1.0   # random weights


class TestCcocrEvalCli:
    def test_index_driven_harness(self, tmp_path, monkeypatch):
        from advancedliteratemachinery_tpu import cli

        index = [{"dataset": "scene_en", "group": "multi_scene_ocr",
                  "release": True}]
        (tmp_path / "index.json").write_text(json.dumps(index))
        pred = tmp_path / "pred" / "scene_en"
        gt = tmp_path / "gt" / "scene_en"
        pred.mkdir(parents=True)
        gt.mkdir(parents=True)
        for stem, p, g in (("img1", "hello world", "hello world"),
                           ("img2", "foo", "foo bar")):
            (pred / f"{stem}.txt").write_text(p)
            (gt / f"{stem}.txt").write_text(g)

        buf = io.StringIO()
        monkeypatch.setattr(sys, "stdout", buf)
        rc = cli.main(["ccocr-eval", str(tmp_path / "index.json"),
                       str(tmp_path / "pred"), str(tmp_path / "gt")])
        sys.stdout = sys.__stdout__
        assert rc == 0
        out = json.loads(buf.getvalue())
        assert "scene_en" in out and "_overall" in out
        assert 0.0 < out["_overall"]["score"] <= 1.0


class TestEvalDetCli:
    def test_scores_detections_file(self, tmp_path, monkeypatch):
        from advancedliteratemachinery_tpu import cli

        gt = {"images": [{"id": 1}],
              "annotations": [{"image_id": 1, "category_id": 1,
                               "bbox": [0, 0, 10, 10]}]}
        dets = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
                 "score": 0.9}]
        (tmp_path / "gt.json").write_text(json.dumps(gt))
        (tmp_path / "dt.json").write_text(json.dumps(dets))
        buf = io.StringIO()
        monkeypatch.setattr(sys, "stdout", buf)
        rc = cli.main(["eval-det", str(tmp_path / "dt.json"),
                       str(tmp_path / "gt.json")])
        sys.stdout = sys.__stdout__
        assert rc == 0
        out = json.loads(buf.getvalue())
        assert np.isclose(out["mAP"], 1.0)


class TestWebRPGVaeRecipe:
    def test_vae_pretrain_through_fit(self):
        import itertools

        import jax

        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
        from advancedliteratemachinery_tpu.engine.recipes import (
            webrpg_vae_recipe,
        )
        from advancedliteratemachinery_tpu.models.webrpg import (
            ElementVAE, WebRPGConfig)
        from advancedliteratemachinery_tpu.parallel.mesh import create_mesh

        cfg = WebRPGConfig(param_vocab=16, parameters_len=4, latent_dim=4,
                           vae_hidden=(8, 16))
        model = ElementVAE(cfg, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        batch = {"param_ids": rng.integers(0, 16, (2, 3, 4)).astype(np.int32),
                 "element_mask": np.ones((2, 3), np.float32)}
        params = model.init(jax.random.PRNGKey(0),
                            batch["param_ids"].reshape(6, 4),
                            jax.random.PRNGKey(1))["params"]
        loss_fn, tx = webrpg_vae_recipe(model, cfg)
        res = fit(loss_fn, tx, params, itertools.repeat(batch),
                  FitConfig(total_steps=4, log_interval=2),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  log_fn=lambda m: None)
        assert res.steps_run == 4
        assert np.isfinite(res.last_metrics["loss"])
        assert "kld" in res.last_metrics

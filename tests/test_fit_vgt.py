"""VGT layout-detection training path: COCO layout annotations + word
grids → cascade detection losses through fit() (reference VGTTrainer =
detectron2 DefaultTrainer over the VGT GeneralizedRCNN)."""

import json

import jax
import numpy as np
from PIL import Image

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine import batches as B
from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
from advancedliteratemachinery_tpu.engine.recipes import vgt_recipe
from advancedliteratemachinery_tpu.models.rcnn import (
    CascadeConfig,
    VGTCascadeDetector,
)
from advancedliteratemachinery_tpu.models.vgt import VGTConfig
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh

TINY_B = VGTConfig(img_size=(64, 64), patch_size=16, embed_dim=32,
                   self_depth=1, cross_depth=4, num_heads=2,
                   grid_embedding_dim=8, vocab_size=100, fpn_dim=16,
                   num_classes=5)
TINY_C = CascadeConfig(num_classes=3, anchor_sizes=(8, 16, 32, 64, 128),
                       pre_nms_topk=64, post_nms_topk=32, fc_dim=32,
                       pooler_resolution=4)


def _coco(tmp_path):
    Image.new("RGB", (100, 100), "white").save(tmp_path / "page.png")
    coco = {
        "images": [{"id": 1, "file_name": "page.png", "height": 100,
                    "width": 100,
                    "words": [{"text": "hello", "x0": 10, "top": 10,
                               "x1": 40, "bottom": 20}]}],
        "annotations": [
            {"id": 1, "image_id": 1, "bbox": [8, 8, 30, 20],
             "category_id": 1},
            {"id": 2, "image_id": 1, "bbox": [50, 40, 40, 30],
             "category_id": 3}],
    }
    p = tmp_path / "layout.json"
    p.write_text(json.dumps(coco))
    return str(p)


def _tok(texts):
    return [[1 + (ord(c) % 90) for c in t] for t in texts]


class TestVgtBatches:
    def test_boxes_scaled_and_grid_built(self, tmp_path):
        it = B.vgt_batches(_coco(tmp_path), str(tmp_path), _tok,
                           image_hw=(64, 64), max_boxes=8)
        b = next(it)
        assert b["images"].shape == (1, 64, 64, 3)
        assert b["grid_ids"].shape == (1, 64, 64)
        assert b["grid_ids"].max() > 0               # words rasterized
        # bbox [8,8,30,20] on a 100x100 page → x0.64 scale
        np.testing.assert_allclose(b["gt_boxes"][0],
                                   [8 * 0.64, 8 * 0.64, 38 * 0.64,
                                    28 * 0.64], atol=1e-5)
        np.testing.assert_array_equal(b["gt_classes"][:2], [0, 2])
        assert b["gt_valid"].sum() == 2

    def test_fit_runs(self, tmp_path):
        it = B.vgt_batches(_coco(tmp_path), str(tmp_path), _tok,
                           image_hw=(64, 64), max_boxes=8)
        det = VGTCascadeDetector(TINY_B, TINY_C, policy=FP32_POLICY)
        b = next(it)
        variables = det.init(jax.random.PRNGKey(0),
                             jax.numpy.asarray(b["images"]),
                             jax.numpy.asarray(b["grid_ids"]))
        loss_fn, tx = vgt_recipe(det)
        res = fit(loss_fn, tx, variables["params"], it,
                  FitConfig(total_steps=2, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  batch_stats=variables["batch_stats"],
                  log_fn=lambda m: None)
        assert res.steps_run == 2
        assert np.isfinite(res.last_metrics["loss"])
        assert "rpn_cls" in res.last_metrics

"""DB detector training path: target-map generation (the DB paper's
shrink/border label formulation) + fit() over the BatchNorm model."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.data.coco_spotting import CocoSpottingDataset
from advancedliteratemachinery_tpu.engine import batches as B
from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
from advancedliteratemachinery_tpu.models.db import (
    DBConfig,
    DBDetector,
    db_targets,
)
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh


class TestDbTargets:
    def test_shrunk_region_and_border_band(self):
        pytest.importorskip("cv2")
        poly = np.array([[20, 20], [80, 20], [80, 50], [20, 50]], np.float32)
        t = db_targets([poly], (96, 96))
        # center of the box is inside the shrunk region
        assert t["gt_prob"][35, 50, 0] == 1.0
        # far outside: nothing
        assert t["gt_prob"][5, 5, 0] == 0.0
        assert t["thresh_mask"][5, 5, 0] == 0.0
        # the band near the original edge carries a high threshold value
        assert t["thresh_mask"][20, 50, 0] == 1.0
        assert t["gt_thresh"][20, 50, 0] > 0.6      # near thresh_max
        # outside the band the map sits at thresh_min
        np.testing.assert_allclose(t["gt_thresh"][5, 5, 0], 0.3, atol=1e-6)
        # d = A(1-r^2)/L for this 60x30 box ≈ 8.4: the shrunk region must
        # be strictly smaller than the original box
        assert t["gt_prob"][22, 22, 0] == 0.0

    def test_degenerate_polygons_skipped(self):
        pytest.importorskip("cv2")
        t = db_targets([np.array([[1, 1], [2, 2]], np.float32)], (32, 32))
        assert t["gt_prob"].sum() == 0


def _coco(tmp_path):
    Image.new("RGB", (100, 100), "white").save(tmp_path / "p.png")
    x0 = 10
    bez = [x0, 10, x0 + 20, 10, x0 + 40, 10, x0 + 60, 10,
           x0 + 60, 40, x0 + 40, 40, x0 + 20, 40, x0, 40]
    coco = {"images": [{"id": 1, "file_name": "p.png",
                        "height": 100, "width": 100}],
            "annotations": [{"id": 1, "image_id": 1, "bezier_pts": bez,
                             "rec": [1, 2] + [96] * 23}]}
    p = tmp_path / "anno.json"
    p.write_text(json.dumps(coco))
    return str(p)


class TestFitDb:
    def test_mutable_fit_runs(self, tmp_path):
        pytest.importorskip("cv2")
        model = DBDetector(DBConfig(width=8, fpn_dim=16, head_dim=8),
                           policy=FP32_POLICY)
        ds = CocoSpottingDataset(str(tmp_path), _coco(tmp_path))
        it = B.db_batches(ds, batch_size=2, image_hw=(64, 64))
        b = next(it)
        assert b["gt_prob"].max() == 1.0            # targets non-trivial
        assert b["images"].max() > 0
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=True)
        loss_fn, tx = B.db_recipe_u8(model)
        res = fit(loss_fn, tx, variables["params"], it,
                  FitConfig(total_steps=3, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  batch_stats=variables["batch_stats"],
                  log_fn=lambda m: None)
        assert res.steps_run == 3
        assert np.isfinite(res.last_metrics["loss"])


@pytest.mark.slow
class TestDbOverfit:
    def test_overfits_detection_f1(self, tmp_path):
        """Task-metric overfit proof (VERDICT r3 item 2): the real DB
        train path (COCO spotting → shrink/border maps → fit) takes the
        tiny detector to perfect detection F1 on its one-page set,
        scored through the REAL post-processing — prob map →
        extract_boxes (binarize/contours/minAreaRect/unclip) →
        IoU-0.5 match (eval/lore_metrics.py bbox_prf, the same
        rectangle-PRF protocol the reference's detection evals use).
        Threshold: F1 == 1.0 (the single word found, nothing spurious)
        at some eval point within 400 steps."""
        pytest.importorskip("cv2")
        import optax
        from PIL import ImageDraw

        from advancedliteratemachinery_tpu.eval.lore_metrics import bbox_prf
        from advancedliteratemachinery_tpu.models.db import extract_boxes
        from advancedliteratemachinery_tpu.ops.image import normalize_crops

        # page with a VISIBLE dark word bar (white page + zero-init biases
        # would leave no spatial signal to localize)
        img = Image.new("RGB", (100, 100), "white")
        ImageDraw.Draw(img).rectangle([10, 10, 70, 40], fill=(20, 20, 20))
        img.save(tmp_path / "p.png")
        anno = _coco(tmp_path)

        model = DBDetector(DBConfig(width=8, fpn_dim=16, head_dim=8),
                           policy=FP32_POLICY)
        ds = CocoSpottingDataset(str(tmp_path), anno)
        it = B.db_batches(ds, batch_size=2, image_hw=(64, 64))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=True)
        loss_fn, _ = B.db_recipe_u8(model)
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(2e-3))

        page64 = np.asarray(img.resize((64, 64)), np.uint8)
        page_dev = jnp.asarray(page64[None])
        # GT rect on the 64x64 frame: (10,10)-(70,40) scaled by 0.64
        gt_rects = [(10 * 0.64, 10 * 0.64, 70 * 0.64, 40 * 0.64)]
        fwd = jax.jit(lambda v, x: model.apply(
            v, normalize_crops(x, dtype=jnp.float32))["prob"])

        best = {"f1": 0.0}

        def eval_fn(state):
            prob = np.asarray(fwd({"params": state.params,
                                   "batch_stats": state.batch_stats},
                                  page_dev))[0, ..., 0]
            quads, _ = extract_boxes(prob)
            rects = [(q[0::2].min(), q[1::2].min(),
                      q[0::2].max(), q[1::2].max())
                     for q in quads.reshape(-1, 8)]
            prf = bbox_prf(rects, gt_rects, iou_thr=0.5)
            best["f1"] = max(best["f1"], prf["f1"])
            return {"det_f1": prf["f1"]}

        fit(loss_fn, tx, variables["params"], it,
            FitConfig(total_steps=400, log_interval=100, val_interval=25),
            mesh=create_mesh(data=1, devices=jax.devices()[:1]),
            batch_stats=variables["batch_stats"], eval_fn=eval_fn,
            log_fn=lambda m: None)
        assert best["f1"] == 1.0, \
            f"detector never reached F1 1.0 on its own page ({best})"

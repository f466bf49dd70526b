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

"""LORE training path: CenterNet target generation (gaussian center +
corner heatmaps, 8-dof corner offsets, logical coords — reference
src/lib/datasets/sample/ctdet.py) + fit() over the BatchNorm DLA model."""

import json

import jax
import numpy as np
import pytest
from PIL import Image

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine import batches as B
from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
from advancedliteratemachinery_tpu.models.lore import (
    LORE,
    gaussian_radius,
    lore_targets,
)
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh


class TestLoreTargets:
    def test_center_peak_and_offsets(self):
        cell = np.array([[16, 16], [48, 16], [48, 32], [16, 32]], np.float32)
        t = lore_targets([cell], [[0, 0, 1, 1]], (64, 64), down_ratio=4)
        # center (8, 6) on the 16x16 output grid peaks at 1
        assert t["hm"][6, 8, 0] == 1.0
        assert t["ct_mask"][0] == 1.0
        assert t["ct_inds"][0] == 6 * 16 + 8
        # corner channel peaks at the 4 (downscaled) corners
        assert t["hm"][4, 4, 1] == 1.0 and t["hm"][8, 12, 1] == 1.0
        # wh: corner offsets from the float center (±4, ±2 on the grid)
        np.testing.assert_allclose(t["wh_target"][0],
                                   [-4, -2, 4, -2, 4, 2, -4, 2], atol=1e-5)
        np.testing.assert_array_equal(t["logic_target"][0], [0, 0, 1, 1])
        # gt boxes in output coords
        np.testing.assert_allclose(t["gt_boxes"][0],
                                   [4, 4, 12, 4, 12, 8, 4, 8], atol=1e-5)

    def test_radius_positive_and_bounded(self):
        r = gaussian_radius((10, 20))
        assert 0 < r < 20

    def test_out_of_frame_cells_skipped(self):
        cell = np.array([[200, 200], [220, 200], [220, 210], [200, 210]],
                        np.float32)
        t = lore_targets([cell], [[0, 0, 0, 0]], (64, 64))
        assert t["ct_mask"].sum() == 0


def _table_json(tmp_path):
    Image.new("RGB", (128, 128), "white").save(tmp_path / "t.png")
    cells = [[16, 16, 60, 16, 60, 40, 16, 40],
             [64, 16, 110, 16, 110, 40, 64, 40]]
    coco = {"images": [{"id": 1, "file_name": "t.png",
                        "height": 128, "width": 128}],
            "annotations": [
                {"id": i + 1, "image_id": 1, "segmentation": c,
                 "logic_axis": [0, 0, i, i]}
                for i, c in enumerate(cells)]}
    p = tmp_path / "tables.json"
    p.write_text(json.dumps(coco))
    return str(p)


class TestFitLore:
    def test_mutable_fit_runs(self, tmp_path):
        from advancedliteratemachinery_tpu.models.dla import (
            DLAConfig, DLASegConfig)
        from advancedliteratemachinery_tpu.models.lore import LoreConfig

        cfg = LoreConfig(
            backbone=DLASegConfig(
                dla=DLAConfig(levels=(1, 1, 1, 1, 1, 1),
                              channels=(4, 8, 16, 16, 32, 32)),
                head_conv=8,
                heads=(("hm", 2), ("wh", 8), ("ax", 16), ("cr", 16),
                       ("st", 8), ("reg", 2))),
            input_size=16, hidden_size=16, tsfm_layers=1,
            stacking_layers=1, num_heads=2, top_k=8, corner_k=8)
        model = LORE(cfg, policy=FP32_POLICY)
        ds = B.TableDataset(str(tmp_path), _table_json(tmp_path))
        it = B.lore_batches(ds, batch_size=2, image_hw=(64, 64),
                            max_cells=8)
        b = next(it)
        assert b["hm"].max() == 1.0
        assert b["ct_mask"].sum() == 4               # 2 pages x 2 cells
        variables = model.init_full(jax.random.PRNGKey(0),
                                    image_shape=(64, 64))
        loss_fn, tx = B.lore_recipe_u8(model)
        res = fit(loss_fn, tx, variables["params"], it,
                  FitConfig(total_steps=2, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  batch_stats=variables["batch_stats"],
                  log_fn=lambda m: None)
        assert res.steps_run == 2
        assert np.isfinite(res.last_metrics["loss"])


@pytest.mark.slow
class TestLoreOverfit:
    def test_overfits_logical_locations(self, tmp_path):
        """Task-metric overfit proof (VERDICT r3 item 2): the real LORE
        train path (TableDataset → lore_batches → lore_recipe_u8 → fit)
        takes the tiny model to correct LOGICAL LOCATIONS on its 2x2-cell
        synthetic table, scored by the reference protocol —
        detect → IoU-match → exact 4-coord logical accuracy
        (eval/lore_metrics.py logical_accuracy; reference
        src/lib/utils/eval_utils.py:116 evalAxis). Threshold: every
        matched cell's logical coords exact (accuracy == 1.0) AND all
        four cells detected (bbox recall == 1.0) at some eval point
        within 1000 steps."""
        import jax.numpy as jnp
        import optax

        from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
        from advancedliteratemachinery_tpu.eval.lore_metrics import (
            bbox_prf, logical_accuracy, quad_to_rect)
        from advancedliteratemachinery_tpu.models.dla import (
            DLAConfig, DLASegConfig)
        from advancedliteratemachinery_tpu.models.lore import LoreConfig
        from advancedliteratemachinery_tpu.ops.image import normalize_crops

        cfg = LoreConfig(
            backbone=DLASegConfig(
                dla=DLAConfig(levels=(1, 1, 1, 1, 1, 1),
                              channels=(4, 8, 16, 16, 32, 32)),
                head_conv=8,
                heads=(("hm", 2), ("wh", 8), ("ax", 32), ("cr", 32),
                       ("st", 8), ("reg", 2))),
            input_size=32, hidden_size=32, tsfm_layers=1,
            stacking_layers=1, num_heads=2, top_k=8, corner_k=8,
            max_fmp_size=32)
        model = LORE(cfg, policy=FP32_POLICY)
        # a VISIBLE 2-cell table (ruled borders — a blank page leaves the
        # translation-invariant backbone nothing to localize) with
        # REALISTIC positive logical coords: the reference Processor ends
        # in ReLU (transformer.py:41 'newly added'), so an all-zero
        # logical target set collapses the head dead; real tables index
        # rows/cols from positive ranges
        from PIL import ImageDraw
        img_pil = Image.new("RGB", (128, 128), "white")
        draw = ImageDraw.Draw(img_pil)
        cells = [[16, 16, 60, 16, 60, 40, 16, 40],
                 [64, 16, 110, 16, 110, 40, 64, 40],
                 [16, 48, 60, 48, 60, 72, 16, 72],
                 [64, 48, 110, 48, 110, 72, 64, 72]]
        logic_axes = [[1, 1, 1, 1], [1, 1, 2, 2],
                      [2, 2, 1, 1], [2, 2, 2, 2]]
        for c in cells:
            draw.rectangle([c[0], c[1], c[4], c[5]], outline=(0, 0, 0),
                           width=2)
        img_pil.save(tmp_path / "t.png")
        coco = {"images": [{"id": 1, "file_name": "t.png",
                            "height": 128, "width": 128}],
                "annotations": [
                    {"id": i + 1, "image_id": 1, "segmentation": c,
                     "logic_axis": logic_axes[i]}
                    for i, c in enumerate(cells)]}
        (tmp_path / "tables.json").write_text(json.dumps(coco))
        ds = B.TableDataset(str(tmp_path), str(tmp_path / "tables.json"))
        it = B.lore_batches(ds, batch_size=2, image_hw=(64, 64),
                            max_cells=8, seed=0)
        variables = model.init_full(jax.random.PRNGKey(0),
                                    image_shape=(64, 64))
        loss_fn, _ = B.lore_recipe_u8(model)
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(2e-3))

        # GT on the 16x16 output grid of the 64x64 train size
        s = ds[0]
        scale = 64.0 / 128.0 / 4.0
        gt_rects = [quad_to_rect((np.asarray(c, np.float32) * scale
                                  ).reshape(-1)) for c in s["cells"]]
        gt_axes = [list(map(int, a)) for a in s["logic"]]

        from PIL import Image as PILImage
        import os
        img = np.asarray(PILImage.open(
            os.path.join(s["image_folder"], s["file_name"])
        ).convert("RGB").resize((64, 64)), np.uint8)
        img_dev = jnp.asarray(img[None])
        infer = jax.jit(lambda v, x: model.apply(
            v, normalize_crops(x, dtype=jnp.float32), method=model.infer))

        best = {"logic": 0.0, "recall": 0.0, "joint": 0.0}

        def eval_fn(state):
            out = infer({"params": state.params,
                         "batch_stats": state.batch_stats}, img_dev)
            det = np.asarray(out["detections"])[0]
            scores = np.asarray(out["scores"])[0]
            logic = np.rint(np.asarray(out["logic"])[0])
            keep = scores > 0.3
            pred_rects = [quad_to_rect(d[:8]) for d in det[keep]]
            pred_axes = [logic[i] for i in np.nonzero(keep)[0]]
            prf = bbox_prf(pred_rects, gt_rects)
            acc = logical_accuracy(pred_rects, pred_axes, gt_rects,
                                   gt_axes)
            best["logic"] = max(best["logic"], acc)
            best["recall"] = max(best["recall"], prf["recall"])
            joint = acc if prf["recall"] == 1.0 else 0.0
            best["joint"] = max(best["joint"], joint)
            return {"logic_acc": acc, "recall": prf["recall"]}

        fit(loss_fn, tx, variables["params"], it,
            FitConfig(total_steps=1000, log_interval=200, val_interval=50),
            mesh=create_mesh(data=1, devices=jax.devices()[:1]),
            batch_stats=variables["batch_stats"], eval_fn=eval_fn,
            log_fn=lambda m: None)
        assert best["joint"] == 1.0, (
            f"never reached full detection + exact logical coords: {best}")

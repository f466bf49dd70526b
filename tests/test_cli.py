"""CLI surface: command registration + light dispatch checks (reference
DocXChain example.py task list: read / structurize / table / convert)."""

import json

import pytest

from advancedliteratemachinery_tpu import cli

pytestmark = pytest.mark.fast


def test_models_lists_registry(capsys):
    assert cli.main(["models"]) == 0
    out = capsys.readouterr().out
    assert "mgp_str" in out and "lore" in out


@pytest.mark.parametrize("cmd", ["recognize", "read", "structurize",
                                 "table", "convert", "bench", "import-ckpt"])
def test_all_commands_registered(cmd):
    with pytest.raises(SystemExit) as e:
        cli.main([cmd, "--help"])
    assert e.value.code == 0


def test_table_pipeline_with_stubbed_modules(monkeypatch, tmp_path):
    """cmd_table wiring end-to-end with stub predictors (no model compile)."""
    import numpy as np

    img = tmp_path / "page.png"
    import cv2
    cv2.imwrite(str(img), np.full((64, 64, 3), 255, np.uint8))

    monkeypatch.setattr(cli, "_lore_table_fn", lambda args: lambda image: {
        "polygons": np.asarray([[0, 0, 64, 0, 64, 32, 0, 32]], np.float32),
        "logi_coords": np.asarray([[0, 0, 0, 0]], np.int32)})
    monkeypatch.setattr(cli, "_db_detect_fn", lambda args: lambda image: (
        np.asarray([[[4, 4], [30, 4], [30, 20], [4, 20]]],
                   np.float32).reshape(1, 8), np.asarray([0.9])))

    class StubEngine:
        def recognize(self, crops):
            return [("cell", 0.8, "char")] * len(crops)

    monkeypatch.setattr(cli, "_rec_engine", lambda args: StubEngine())

    assert cli.main(["table", str(img)]) == 0


def test_augment_preview_writes_all_ops(tmp_path):
    import cv2
    import numpy as np

    img = tmp_path / "word.png"
    cv2.imwrite(str(img), np.random.default_rng(0).integers(
        0, 255, (32, 128, 3), dtype=np.uint8))
    out_dir = tmp_path / "prev"
    assert cli.main(["augment-preview", str(img),
                     "--out-dir", str(out_dir)]) == 0
    from advancedliteratemachinery_tpu.data.augment import GROUPS
    n_ops = sum(len(v) for v in GROUPS.values())
    assert len(list(out_dir.glob("*.png"))) == n_ops


def test_models_cost(capsys):
    from advancedliteratemachinery_tpu import cli
    rc = cli.main(["models", "--cost", "mgp_str", "--variant", "tiny"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cost[mgp_str-tiny]" in out and "params=" in out

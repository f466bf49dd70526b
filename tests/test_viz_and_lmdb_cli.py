"""User-facing dataset creation + visualization utilities.

create-lmdb mirrors reference OCR/MGP-STR/create_lmdb_dataset.py (gt file
of `path\\tlabel` lines → LMDB with num-samples / image-%09d / label-%09d)
and must round-trip through the framework's own reader; the visualization
helpers mirror DocXChain utilities/visualization.py overlays.
"""

import io
import json
import sys

import numpy as np
import pytest
from PIL import Image

from advancedliteratemachinery_tpu.data.str_dataset import LmdbStrDataset
from advancedliteratemachinery_tpu.utils.visualization import (
    draw_quads,
    draw_reading,
    draw_structurization,
    draw_table,
    save_image,
)


def _write_png(path, color):
    Image.new("RGB", (40, 20), color).save(path)


class TestCreateLmdbCli:
    def test_round_trips_through_reader(self, tmp_path, monkeypatch):
        from advancedliteratemachinery_tpu import cli

        imgs = tmp_path / "imgs"
        imgs.mkdir()
        _write_png(imgs / "a.png", "white")
        _write_png(imgs / "b.png", "black")
        gt = tmp_path / "gt.txt"
        gt.write_text("a.png\thello\nb.png\tworld42\n")
        out_dir = str(tmp_path / "lmdb")

        buf = io.StringIO()
        monkeypatch.setattr(sys, "stdout", buf)
        rc = cli.main(["create-lmdb", str(gt), out_dir,
                       "--root", str(imgs)])
        sys.stdout = sys.__stdout__
        assert rc == 0
        assert json.loads(buf.getvalue())["num_samples"] == 2

        ds = LmdbStrDataset(out_dir, charset="abcdefghijklmnopqrstuvwxyz"
                                             "0123456789", max_length=25)
        assert len(ds) == 2
        img, label = ds[0]
        assert label == "hello"
        assert img.shape == (20, 40, 3)

    def test_invalid_images_skipped(self, tmp_path):
        from advancedliteratemachinery_tpu.data.lmdb_writer import (
            create_str_lmdb,
        )

        (tmp_path / "bad.png").write_bytes(b"not a png")
        gt = tmp_path / "gt.txt"
        gt.write_text("bad.png\toops\n")
        n = create_str_lmdb(str(gt), str(tmp_path / "out"),
                            root=str(tmp_path))
        assert n == 0


class TestVisualization:
    def _img(self):
        return np.full((64, 96, 3), 255, np.uint8)

    def test_draw_quads_marks_pixels(self):
        img = self._img()
        out = draw_quads(img, [[10, 10, 50, 10, 50, 30, 10, 30]],
                         texts=["hi"])
        assert out.shape == img.shape
        assert (out != img).any()
        assert (img == 255).all()          # input untouched

    def test_draw_reading_and_structurization(self):
        img = self._img()
        reading = {"instances": [{"poly": [5, 5, 40, 5, 40, 20, 5, 20],
                                  "text": "abc"}]}
        assert (draw_reading(img, reading) != img).any()
        regions = [{"category_index": 2, "category_name": "text",
                    "region_poly": [2, 2, 90, 2, 90, 60, 2, 60],
                    "text_list": [{"poly": [5, 5, 40, 5, 40, 20, 5, 20],
                                   "text": "abc"}]}]
        assert (draw_structurization(img, regions) != img).any()

    def test_draw_table_skips_dummy_cells(self):
        img = self._img()
        res = {"cells": [{"poly": [-1, -1, -1, -1, -1, -1, -1, -1]},
                         {"poly": [4, 4, 60, 4, 60, 40, 4, 40]}]}
        out = draw_table(img, res)
        assert (out != img).any()

    def test_save_image(self, tmp_path):
        pytest.importorskip("cv2")
        p = str(tmp_path / "o.png")
        save_image(self._img(), p)
        assert Image.open(p).size == (96, 64)

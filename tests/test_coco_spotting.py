import json

import numpy as np
import pytest

from advancedliteratemachinery_tpu.codecs.coords import CoordSeqVocab
from advancedliteratemachinery_tpu.data.coco_spotting import (
    CocoSpottingDataset,
    bezier_center_points,
    bezier_polygon,
    build_spotting_sequences,
    sample_bezier_curve,
)
from advancedliteratemachinery_tpu.engine.checkpoint import resize_embedding


def _straight_bezier(x0, y0, x1, y1):
    """Degenerate bezier = straight line from (x0,y0) to (x1,y1)."""
    xs = np.linspace(x0, x1, 4)
    ys = np.linspace(y0, y1, 4)
    return np.stack([xs, ys], axis=1)


class TestBezier:
    def test_line_midpoint(self):
        ctrl = _straight_bezier(0, 0, 10, 0)
        mid = sample_bezier_curve(ctrl, mid_point=True)
        np.testing.assert_allclose(mid, [5, 0], atol=1e-9)

    def test_center_points(self):
        top = _straight_bezier(0, 0, 10, 0)
        bottom = _straight_bezier(0, 4, 10, 4)
        bez = np.concatenate([top, bottom]).reshape(1, 16)
        c = bezier_center_points(bez)
        np.testing.assert_allclose(c[0], [5, 2], atol=1e-9)

    def test_polygon_shape(self):
        top = _straight_bezier(0, 0, 10, 0)
        bottom = _straight_bezier(0, 4, 10, 4)
        poly = bezier_polygon(np.concatenate([top, bottom]).reshape(16))
        assert poly.shape == (16, 2)
        assert poly[:, 1].max() == pytest.approx(4.0)


class TestCocoSpotting:
    @pytest.fixture()
    def coco_file(self, tmp_path):
        top = _straight_bezier(10, 10, 50, 10)
        bottom = _straight_bezier(10, 20, 50, 20)
        bez = np.concatenate([top, bottom]).reshape(16).tolist()
        coco = {
            "images": [{"id": 1, "file_name": "a.png", "height": 100,
                        "width": 100}],
            "annotations": [
                {"id": 1, "image_id": 1, "iscrowd": 0, "bezier_pts": bez,
                 "rec": list(range(25))},
                {"id": 2, "image_id": 1, "iscrowd": 1, "bezier_pts": bez,
                 "rec": list(range(25))},  # crowd → filtered
            ],
        }
        p = tmp_path / "anno.json"
        p.write_text(json.dumps(coco))
        return str(p)

    def test_dataset(self, coco_file, tmp_path):
        ds = CocoSpottingDataset(str(tmp_path), coco_file)
        assert len(ds) == 1
        s = ds[0]
        assert s["bezier_pts"].shape == (1, 16)  # crowd filtered
        np.testing.assert_allclose(s["center_pts"][0], [30, 15], atol=1e-6)

    def test_build_sequences(self, coco_file, tmp_path):
        ds = CocoSpottingDataset(str(tmp_path), coco_file)
        v = CoordSeqVocab(num_bins=100)
        seqs = build_spotting_sequences(ds[0], v)
        # center (30, 15) on a 100x100 image → bins (30, 15)
        assert seqs["pt_seq"][0] == 30 and seqs["pt_seq"][1] == 15
        assert seqs["pt_seq"][-1] == v.pt_eos_index
        assert seqs["poly_seqs"].shape == (1, 32)
        assert (seqs["poly_seqs"] < 100).all()
        assert seqs["rec_seqs"].shape == (1, 25)


class TestResizeEmbedding:
    def test_grows_vocab_rows(self):
        old = {"emb": {"embedding": np.arange(12.0).reshape(4, 3)},
               "head": {"kernel": np.ones((3, 4)), "bias": np.zeros(4)}}
        new = {"emb": {"embedding": np.zeros((6, 3))},
               "head": {"kernel": np.zeros((3, 6)), "bias": np.zeros(6)}}
        out = resize_embedding(new, old,
                               replace_paths=[("emb", "embedding"),
                                              ("head", "kernel"),
                                              ("head", "bias")],
                               added_rows=2)
        np.testing.assert_array_equal(out["emb"]["embedding"][:4],
                                      old["emb"]["embedding"])
        np.testing.assert_array_equal(out["head"]["kernel"][:, :4],
                                      old["head"]["kernel"])
        np.testing.assert_array_equal(out["head"]["bias"][:4], 0)

    def test_shape_mismatch_raises(self):
        old = {"w": np.ones((4, 3))}
        new = {"w": np.zeros((9, 9))}
        with pytest.raises(ValueError):
            resize_embedding(new, old, replace_paths=[], added_rows=2)

"""VIE spotting data path: CORD-v2-style parsing, reading-order class
sequences, window prompts, and the omniparser VIE/spotting batch layout
(reference dataset/cord.py, sroie.py, collate_fn.py)."""

import json

import numpy as np
import pytest

from advancedliteratemachinery_tpu.codecs.coords import CoordSeqVocab
from advancedliteratemachinery_tpu.data.vie_spotting import (
    CordLikeVieDataset,
    build_vie_pt_sequence,
    quad_polygon,
)

V = CoordSeqVocab(num_bins=100, chars="abc", vie_categories=2)


def _quad(x1, y1, x2, y2):
    return {"x1": x1, "y1": y1, "x2": x2, "y2": y1,
            "x3": x2, "y3": y2, "x4": x1, "y4": y2}


RAW_PAGE = {
    "valid_line": [
        {"category": "k1",
         "words": [
             {"quad": _quad(10, 80, 30, 90), "text": "ab", "is_key": 0},
             {"quad": _quad(40, 80, 60, 90), "text": "c", "is_key": 0},
             {"quad": _quad(0, 0, 5, 5), "text": "KEY", "is_key": 1},
         ]},
        {"category": "k0",
         "words": [{"quad": _quad(10, 10, 30, 20), "text": "zz",
                    "is_key": 0}]},
        {"category": "not_a_class",
         "words": [{"quad": _quad(0, 0, 9, 9), "text": "x", "is_key": 0}]},
    ],
    "meta": {"image_size": {"width": 100, "height": 100}},
}


@pytest.fixture()
def page(tmp_path):
    (tmp_path / "p.json").write_text(json.dumps(RAW_PAGE))
    ds = CordLikeVieDataset(str(tmp_path), str(tmp_path), ("k0", "k1"),
                            chars="abc", group_words=True)
    return ds[0]


class TestCordParsing:
    def test_words_and_instances(self, page):
        # is_key word and unknown-category line dropped
        assert len(page["words"]) == 3
        assert page["words"][0]["rec"] == [0, 1]       # 'ab'
        assert page["words"][1]["rec"] == [2]          # 'c'
        assert page["words"][2]["rec"] == [3, 3]       # 'zz' → unknown x2
        assert len(page["instances"]) == 2
        k1, k0 = page["instances"]
        assert k1["class_idx"] == 1 and k1["word_idxs"] == [0, 1]
        assert k0["class_idx"] == 0
        np.testing.assert_allclose(k0["center"], [20, 15])

    def test_vie_sequence_reading_order_and_grouping(self, page):
        seq = build_vie_pt_sequence(page, V)
        base = V.vie_class_base
        # k0 (y=15) sorts before k1 (y=85); cord grouping: k1's two word
        # centers then ONE class token
        want = [20, 15, base + 0,
                20, 85, base + 1, 50, 85, base + 1]
        # (group_words=True: class after ALL the entity's points)
        want = [20, 15, base + 0, 20, 85, 50, 85, base + 1]
        assert seq.tolist() == want

    def test_sroie_style_triplets(self, tmp_path):
        (tmp_path / "p.json").write_text(json.dumps(RAW_PAGE))
        ds = CordLikeVieDataset(str(tmp_path), str(tmp_path), ("k0", "k1"),
                                chars="abc", group_words=False)
        seq = build_vie_pt_sequence(ds[0], V)
        base = V.vie_class_base
        assert seq.tolist() == [20, 15, base + 0,
                                20, 85, base + 1, 50, 85, base + 1]
        assert len(seq) % 3 == 0

    def test_quad_polygon_samples_edges(self):
        quad = np.array([[0, 0], [8, 0], [8, 4], [0, 4]], np.float64)
        poly = quad_polygon(quad, pts_per_side=4)
        assert poly.shape == (8, 2)
        np.testing.assert_allclose(poly[0], [0, 0])
        np.testing.assert_allclose(poly[3], [8, 0])
        np.testing.assert_allclose(poly[4], [8, 4])
        np.testing.assert_allclose(poly[7], [0, 4])


class TestVieBatches:
    def test_layout_and_targets(self, page):
        from advancedliteratemachinery_tpu.engine.batches import (
            omniparser_vie_batches)

        class DS:
            def __len__(self):
                return 1

            def __getitem__(self, i):
                return page

        b = next(omniparser_vie_batches(DS(), V, batch_size=2,
                                        image_hw=(32, 32), max_pt_body=24,
                                        poly_pts=4, rec_length=5, seed=0))
        P = 6  # 4 spatial + 2 char window
        assert b["pt_in"].shape == (2, P + 1 + 24)
        # fixed full-window prompt + sos
        nb = V.num_bins
        assert b["pt_in"][0, :P].tolist() == [0, 0, nb - 1, nb - 1,
                                              nb, nb + 3]
        assert b["pt_in"][0, P] == V.pt_sos_index
        seq = build_vie_pt_sequence(page, V)
        np.testing.assert_array_equal(b["pt_in"][0, P + 1: P + 1 + len(seq)],
                                      seq)
        # out: pad over prompt, then body + eos
        assert (b["pt_out"][0, :P] == V.padding_index).all()
        np.testing.assert_array_equal(b["pt_out"][0, P: P + len(seq)], seq)
        assert b["pt_out"][0, P + len(seq)] == V.pt_eos_index
        # teacher-forcing alignment: in[t+1] == out[t] over the body
        np.testing.assert_array_equal(b["pt_in"][0, P + 1: P + 1 + len(seq)],
                                      b["pt_out"][0, P: P + len(seq)])
        # rec targets end with rec_eos
        row = b["rec_out"][0]
        nz = row[row != V.padding_index]
        assert nz[-1] == V.rec_eos_index


class TestSpottingWindowPrompts:
    def test_prompt_prefix_and_filtering(self):
        from advancedliteratemachinery_tpu.engine.batches import (
            omniparser_batches)

        sample = {
            "file_name": "x.png", "image_folder": "/nonexistent",
            "orig_size": (100, 100),
            "center_pts": np.array([[10.0, 10.0], [50.0, 50.0]]),
            "bezier_pts": np.zeros((2, 16)),
            "recog": np.array([[0, 96], [1, 96]]),
        }

        class DS:
            def __len__(self):
                return 1

            def __getitem__(self, i):
                return sample

        v = CoordSeqVocab(num_bins=100, chars="abc")
        b = next(omniparser_batches(DS(), v, batch_size=4,
                                    image_hw=(32, 32), max_pts=4,
                                    poly_pts=4, rec_length=5, seed=0))
        P = 6
        assert b["pt_in"].shape == (4, P + 1 + 8)
        for r in range(4):
            row = b["pt_in"][r]
            # window prompt: 4 coords + char range + sos
            assert (row[:4] < v.num_bins).all()
            assert row[4] >= v.num_bins and row[5] >= v.num_bins
            assert row[P] == v.pt_sos_index
            # kept points echo into out with eos behind
            out = b["pt_out"][r]
            assert (out[:P] == v.padding_index).all()
            body = out[P:]
            body = body[body != v.padding_index]
            assert body[-1] == v.pt_eos_index

    def test_disable_restores_promptless_layout(self):
        from advancedliteratemachinery_tpu.engine.batches import (
            omniparser_batches)

        sample = {
            "file_name": "x.png", "image_folder": "/nonexistent",
            "orig_size": (100, 100),
            "center_pts": np.array([[10.0, 10.0]]),
            "bezier_pts": np.zeros((1, 16)),
            "recog": np.array([[0, 96]]),
        }

        class DS:
            def __len__(self):
                return 1

            def __getitem__(self, i):
                return sample

        v = CoordSeqVocab(num_bins=100, chars="abc")
        b = next(omniparser_batches(DS(), v, batch_size=1,
                                    image_hw=(32, 32), max_pts=4,
                                    poly_pts=4, rec_length=5, seed=0,
                                    window_prompts=False))
        assert b["pt_in"].shape == (1, 1 + 8)
        assert b["pt_in"][0, 0] == v.pt_sos_index


class TestVieTrainCLI:
    def test_train_omniparser_vie_smoke(self, monkeypatch, tmp_path):
        """`train omniparser --task vie` end to end on a tiny config:
        CordLikeVieDataset -> omniparser_vie_batches -> fit."""
        from PIL import Image

        import advancedliteratemachinery_tpu.models.omniparser as MO
        from advancedliteratemachinery_tpu.models.swin import SwinConfig

        anns = tmp_path / "anns"
        imgs = tmp_path / "imgs"
        anns.mkdir(); imgs.mkdir()
        (anns / "r0.json").write_text(json.dumps({
            "valid_line": [
                {"category": "total.total_price",
                 "words": [{"quad": _quad(10, 10, 40, 20),
                            "text": "9.99", "is_key": 0}]}],
            "meta": {"image_size": {"width": 64, "height": 64}}}))
        Image.new("RGB", (64, 64), (250, 250, 250)).save(imgs / "r0.png")

        orig = MO.OmniParserConfig
        tiny_swin = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                               num_heads=(1, 2, 2, 2), window_size=4,
                               drop_path_rate=0.0)

        def tiny_cfg(**kw):
            kw.update(d_model=32, nhead=2, dec_layers=1, dim_feedforward=64,
                      num_bins=50, max_position_embeddings=128,
                      pt_seq_length=10, poly_length=8, rec_length=6,
                      max_instances=4, drop_path_rate=0.0, swin=tiny_swin)
            return orig(**kw)

        monkeypatch.setattr(MO, "OmniParserConfig", tiny_cfg)

        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["train", "omniparser", "--task", "vie",
                       "--class-set", "cord",
                       "--train-data", str(anns), "--img-root", str(imgs),
                       "--image-size", "64", "--batch-size", "8",
                       "--steps", "2", "--log-interval", "1",
                       "--ckpt-dir", str(tmp_path / "run")])
        assert rc == 0


class TestVieCLI:
    def test_vie_command_outputs_entities(self, monkeypatch, tmp_path,
                                          capsys):
        from PIL import Image

        import advancedliteratemachinery_tpu.models.omniparser as MO
        from advancedliteratemachinery_tpu.models.swin import SwinConfig

        img = tmp_path / "receipt.png"
        Image.new("RGB", (80, 60), (240, 240, 240)).save(img)

        orig = MO.OmniParserConfig
        tiny_swin = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                               num_heads=(1, 2, 2, 2), window_size=4,
                               drop_path_rate=0.0)

        def tiny_cfg(**kw):
            kw.update(d_model=32, nhead=2, dec_layers=1, dim_feedforward=64,
                      num_bins=50, max_position_embeddings=64,
                      pt_seq_length=9, poly_length=8, rec_length=6,
                      max_instances=4, drop_path_rate=0.0, swin=tiny_swin)
            return orig(**kw)

        monkeypatch.setattr(MO, "OmniParserConfig", tiny_cfg)

        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["vie", str(img), "--class-set", "sroie",
                       "--image-size", "64"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["image"] == str(img)
        assert isinstance(out["entities"], list)
        for e in out["entities"]:
            assert e["class"] in ("company", "address", "date", "total")
            assert len(e["rects"][0]) == 4

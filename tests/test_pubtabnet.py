"""PubTabNet table-recognition path: structure-token parsing, class-token
packing, HTML reconstruction (TEDS-checked), dataset, batch builder, and a
slow-tier S-TEDS overfit proof (reference OCR/OmniParser/README.md reports
PubTabNet S-TEDS but ships no TR dataset code; data/pubtabnet.py supplies
the surface in the unified strict-triplet scheme)."""

import json

import numpy as np
import pytest
from PIL import Image

from advancedliteratemachinery_tpu.codecs.coords import CoordSeqVocab
from advancedliteratemachinery_tpu.data.pubtabnet import (
    N_TABLE_CLASSES,
    PubTabNetDataset,
    build_table_pt_sequence,
    cell_text,
    decode_table_class,
    decode_table_outputs,
    gt_table_html,
    parse_structure_tokens,
    table_class_token,
    table_html,
)
from advancedliteratemachinery_tpu.eval.teds import TEDS

# A realistic PubTabNet record: 2x2 with a header row, one colspan=2 cell
# in the body opening row 2, and one EMPTY cell (no bbox) in row 3.
SAMPLE = {
    "filename": "t0.png",
    "split": "train",
    "html": {
        "structure": {"tokens": [
            "<thead>", "<tr>", "<td>", "</td>", "<td>", "</td>", "</tr>",
            "</thead>", "<tbody>", "<tr>", "<td", ' colspan="2"', ">",
            "</td>", "</tr>", "<tr>", "<td>", "</td>", "<td>", "</td>",
            "</tr>", "</tbody>",
        ]},
        "cells": [
            {"tokens": ["<b>", "H", "1", "</b>"], "bbox": [4, 4, 44, 20]},
            {"tokens": ["H", "2"], "bbox": [52, 4, 92, 20]},
            {"tokens": ["w", "i", "d", "e"], "bbox": [4, 28, 92, 44]},
            {"tokens": []},                                    # empty cell
            {"tokens": ["x"], "bbox": [52, 52, 92, 68]},
        ],
    },
}
SAMPLE_HTML = ("<table><thead><tr><td>H1</td><td>H2</td></tr></thead>"
               "<tbody><tr><td colspan=\"2\">wide</td></tr>"
               "<tr><td></td><td>x</td></tr></tbody></table>")


class TestStructureParsing:
    def test_split_attribute_form(self):
        cells = parse_structure_tokens(SAMPLE["html"]["structure"]["tokens"])
        assert len(cells) == 5
        assert cells[0] == {"header": True, "row_start": True,
                            "colspan": 1, "rowspan": 1}
        assert cells[1] == {"header": True, "row_start": False,
                            "colspan": 1, "rowspan": 1}
        assert cells[2] == {"header": False, "row_start": True,
                            "colspan": 2, "rowspan": 1}
        assert cells[3]["row_start"] and not cells[3]["header"]
        assert not cells[4]["row_start"]

    def test_rowspan_attribute(self):
        cells = parse_structure_tokens(
            ["<tr>", "<td", ' rowspan="3"', ">", "</td>", "<td>", "</td>",
             "</tr>"])
        assert cells[0]["rowspan"] == 3 and cells[0]["colspan"] == 1
        assert cells[1]["rowspan"] == 1

    def test_cell_text_drops_inline_tags(self):
        assert cell_text(["<b>", "a", "</b>", " ", "<i>", "b", "</i>"]) \
            == "a b"


class TestClassToken:
    def test_round_trip_exhaustive_bits(self):
        v = CoordSeqVocab(num_bins=50, vie_categories=N_TABLE_CLASSES)
        for header in (False, True):
            for row_start in (False, True):
                for empty in (False, True):
                    for cs in (1, 2, 10):
                        for rs in (1, 5, 10):
                            tok = table_class_token(
                                v, header, row_start, empty, cs, rs)
                            assert v.vie_class_base <= tok < v.num_classes
                            st = decode_table_class(v, tok)
                            assert st == {"header": header,
                                          "row_start": row_start,
                                          "empty": empty,
                                          "colspan": cs, "rowspan": rs}

    def test_span_saturates(self):
        v = CoordSeqVocab(num_bins=50, vie_categories=N_TABLE_CLASSES)
        tok = table_class_token(v, False, True, False, 25, 0)
        st = decode_table_class(v, tok)
        assert st["colspan"] == 10 and st["rowspan"] == 1

    def test_out_of_band_rejected(self):
        v = CoordSeqVocab(num_bins=50, vie_categories=N_TABLE_CLASSES)
        with pytest.raises(ValueError):
            decode_table_class(v, v.vie_class_base - 1)


class TestHtmlReconstruction:
    def test_gt_html_exact(self):
        assert gt_table_html(SAMPLE) == SAMPLE_HTML

    def test_teds_self_similarity_is_one(self):
        html = gt_table_html(SAMPLE)
        assert TEDS().evaluate(html, html) == 1.0
        assert TEDS(structure_only=True).evaluate(html, html) == 1.0

    def test_structure_error_detected_by_steds(self):
        cells = parse_structure_tokens(SAMPLE["html"]["structure"]["tokens"])
        broken = [dict(c) for c in cells]
        broken[2]["colspan"] = 1                     # drop the span
        s = TEDS(structure_only=True).evaluate(
            table_html(broken), table_html(cells))
        assert s < 1.0

    def test_all_body_table_has_no_thead(self):
        cells = [{"header": False, "row_start": True}]
        assert table_html(cells) == \
            "<table><tbody><tr><td></td></tr></tbody></table>"

    def test_text_is_escaped(self):
        cells = [{"header": False, "row_start": True}]
        html = table_html(cells, contents=["a<b&c"])
        assert "a&lt;b&amp;c" in html


def _write_jsonl(tmp_path, records):
    p = tmp_path / "ptn.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in records))
    return str(p)


class TestDataset:
    def test_getitem_schema(self, tmp_path):
        Image.new("RGB", (100, 80), "white").save(tmp_path / "t0.png")
        ds = PubTabNetDataset(_write_jsonl(tmp_path, [SAMPLE]),
                              str(tmp_path), chars=CoordSeqVocab().chars)
        assert len(ds) == 1
        page = ds[0]
        assert page["orig_size"] == (80, 100)        # (H, W) from the image
        assert page["gt_html"] == SAMPLE_HTML
        cells = page["cells"]
        assert len(cells) == 5
        assert cells[3]["empty"] and not cells[2]["empty"]
        assert cells[2]["colspan"] == 2
        np.testing.assert_allclose(cells[0]["center"], (24.0, 12.0))
        assert cells[0]["rec"] == [CoordSeqVocab().chars.find("H"),
                                   CoordSeqVocab().chars.find("1")]

    def test_size_falls_back_to_bbox_extent(self, tmp_path):
        ds = PubTabNetDataset(_write_jsonl(tmp_path, [SAMPLE]),
                              str(tmp_path / "missing"),
                              chars=CoordSeqVocab().chars)
        h, w = ds[0]["orig_size"]
        assert w >= 92 and h >= 68

    def test_split_filter(self, tmp_path):
        other = dict(SAMPLE, split="val")
        path = _write_jsonl(tmp_path, [SAMPLE, other])
        chars = CoordSeqVocab().chars
        assert len(PubTabNetDataset(path, str(tmp_path), chars)) == 2
        assert len(PubTabNetDataset(path, str(tmp_path), chars,
                                    split="val")) == 1

    def test_misaligned_cells_raise(self, tmp_path):
        bad = json.loads(json.dumps(SAMPLE))
        bad["html"]["cells"] = bad["html"]["cells"][:-1]
        ds = PubTabNetDataset(_write_jsonl(tmp_path, [bad]),
                              str(tmp_path), chars=CoordSeqVocab().chars)
        with pytest.raises(ValueError, match="vs"):
            ds[0]


class TestPtSequence:
    def test_strict_triplet_walk(self, tmp_path):
        v = CoordSeqVocab(num_bins=50, vie_categories=N_TABLE_CLASSES)
        Image.new("RGB", (100, 80), "white").save(tmp_path / "t0.png")
        ds = PubTabNetDataset(_write_jsonl(tmp_path, [SAMPLE]),
                              str(tmp_path), chars=v.chars)
        seq = build_table_pt_sequence(ds[0], v)
        assert len(seq) == 3 * 5
        coords, classes = seq.reshape(5, 3)[:, :2], seq.reshape(5, 3)[:, 2]
        assert (coords < v.num_bins).all()
        assert (classes >= v.vie_class_base).all()
        # empty cell -> (0, 0) placeholder
        assert tuple(coords[3]) == (0, 0)
        assert decode_table_class(v, classes[3])["empty"]
        # first header cell center (24, 12) on a 100x80 page, 50 bins
        assert tuple(coords[0]) == (12, 7)
        st = decode_table_class(v, classes[2])
        assert st["colspan"] == 2 and st["row_start"]

    def test_truncation(self, tmp_path):
        v = CoordSeqVocab(num_bins=50, vie_categories=N_TABLE_CLASSES)
        Image.new("RGB", (100, 80), "white").save(tmp_path / "t0.png")
        ds = PubTabNetDataset(_write_jsonl(tmp_path, [SAMPLE]),
                              str(tmp_path), chars=v.chars)
        assert len(build_table_pt_sequence(ds[0], v, max_tokens=7)) == 7


class TestBatches:
    def test_batch_layout(self, tmp_path):
        from advancedliteratemachinery_tpu.engine import batches as B

        v = CoordSeqVocab(num_bins=50, vie_categories=N_TABLE_CLASSES)
        Image.new("RGB", (100, 80), "gray").save(tmp_path / "t0.png")
        ds = PubTabNetDataset(_write_jsonl(tmp_path, [SAMPLE]),
                              str(tmp_path), chars=v.chars, rec_length=6)
        it = B.omniparser_table_batches(ds, v, batch_size=2,
                                        image_hw=(64, 64), max_pt_body=32,
                                        poly_pts=4, rec_length=6)
        b = next(it)
        assert b["images"].shape == (2, 64, 64, 3)
        assert b["images"].max() > 0
        # fixed full-window prompt then pt_sos then the triplet walk
        nb = v.num_bins
        np.testing.assert_array_equal(
            b["pt_in"][0, :7],
            [0, 0, nb - 1, nb - 1, nb, nb + len(v.chars), v.pt_sos_index])
        body = build_table_pt_sequence(ds[0], v, max_tokens=32)
        np.testing.assert_array_equal(b["pt_in"][0, 7:7 + len(body)], body)
        # targets: prompt positions padded, then body + EOS
        assert (b["pt_out"][0, :6] == v.padding_index).all()
        np.testing.assert_array_equal(b["pt_out"][0, 6:6 + len(body)], body)
        assert b["pt_out"][0, 6 + len(body)] == v.pt_eos_index
        # poly/rec teacher-force one non-empty cell
        assert b["poly_in"][0, 0] < nb and b["poly_in"][0, 1] < nb
        assert b["poly_in"][0, 2] == v.poly_sos_index
        assert (b["poly_out"][0, :2] == v.padding_index).all()
        assert (b["poly_out"][0, 2:] < nb).all()     # all quantized coords
        assert b["rec_in"][0, 2] == v.rec_sos_index
        assert v.rec_eos_index in b["rec_out"][0]
        chars = b["rec_out"][0][(b["rec_out"][0] >= nb)
                                & (b["rec_out"][0] < v.recog_pad_index)]
        assert len(chars) >= 1                        # some text present


class TestDecodeOutputs:
    def test_model_output_round_trip(self, tmp_path):
        """Fabricate infer_vie-shaped outputs carrying SAMPLE's ground
        truth and check the decoded HTML matches gt exactly (TEDS 1.0)."""
        v = CoordSeqVocab(num_bins=50, vie_categories=N_TABLE_CLASSES)
        Image.new("RGB", (100, 80), "white").save(tmp_path / "t0.png")
        ds = PubTabNetDataset(_write_jsonl(tmp_path, [SAMPLE]),
                              str(tmp_path), chars=v.chars)
        page = ds[0]
        n = len(page["cells"])
        seq = build_table_pt_sequence(page, v).reshape(n, 3)
        rec = np.full((n, 8), v.rec_eos_index, np.int32)
        for i, c in enumerate(page["cells"]):
            toks = v.encode_text(c["text"])[:8]
            rec[i, :len(toks)] = toks
        outputs = {
            "instance_valid": np.ones((1, n), bool),
            "points": seq[None, :, :2],
            "classes": seq[None, :, 2],
            "rec_tokens": rec[None],
        }
        res = decode_table_outputs(outputs, v, page["orig_size"])
        assert TEDS().evaluate(res["html"], page["gt_html"]) \
            == pytest.approx(1.0)
        assert TEDS(structure_only=True).evaluate(
            res["structure_html"], page["gt_html"]) == pytest.approx(1.0)
        # empty cell carries no coords/text
        assert res["cells"][3]["center"] is None
        assert res["cells"][3]["text"] == ""


class TestTableCLI:
    def _tiny(self, monkeypatch):
        import advancedliteratemachinery_tpu.models.omniparser as MO
        from advancedliteratemachinery_tpu.models.swin import SwinConfig

        orig = MO.OmniParserConfig
        tiny_swin = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                               num_heads=(1, 2, 2, 2), window_size=4,
                               drop_path_rate=0.0)

        def tiny_cfg(**kw):
            kw.update(d_model=32, nhead=2, dec_layers=1, dim_feedforward=64,
                      num_bins=50, max_position_embeddings=128,
                      pt_seq_length=12, poly_length=8, rec_length=6,
                      max_instances=4, drop_path_rate=0.0, swin=tiny_swin)
            return orig(**kw)

        monkeypatch.setattr(MO, "OmniParserConfig", tiny_cfg)

    def test_train_omniparser_table_smoke(self, monkeypatch, tmp_path):
        """`train omniparser --task table` end to end on a tiny config:
        PubTabNetDataset -> omniparser_table_batches -> fit."""
        self._tiny(monkeypatch)
        Image.new("RGB", (100, 68), "gray").save(tmp_path / "t0.png")
        jsonl = _write_jsonl(tmp_path, [SAMPLE])

        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["train", "omniparser", "--task", "table",
                       "--train-data", jsonl, "--img-root", str(tmp_path),
                       "--image-size", "64", "--batch-size", "8",
                       "--steps", "2", "--log-interval", "1",
                       "--ckpt-dir", str(tmp_path / "run")])
        assert rc == 0

    def test_table_html_command(self, monkeypatch, tmp_path, capsys):
        """`table-html IMG` runs infer_vie with the table class band and
        prints a JSON record with html/structure_html/cells."""
        self._tiny(monkeypatch)
        img = tmp_path / "table.png"
        Image.new("RGB", (100, 68), (240, 240, 240)).save(img)

        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["table-html", str(img), "--image-size", "64"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert set(out) >= {"image", "html", "structure_html", "cells"}
        assert out["html"].startswith("<table>")

    def test_table_eval_command(self, monkeypatch, tmp_path, capsys):
        """`table-eval DATA.jsonl` scores TEDS/S-TEDS over the dataset
        with an (untrained) tiny model — scores land in [0, 1]."""
        self._tiny(monkeypatch)
        Image.new("RGB", (100, 68), "gray").save(tmp_path / "t0.png")
        jsonl = _write_jsonl(tmp_path, [SAMPLE])

        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["table-eval", jsonl, "--img-root", str(tmp_path),
                       "--image-size", "64", "--per-sample"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["samples"] == 1
        assert 0.0 <= out["teds"] <= 1.0
        assert 0.0 <= out["s_teds"] <= 1.0
        assert out["per_sample"][0]["file"] == "t0.png"

    def test_table_eval_empty_split_errors(self, monkeypatch, tmp_path,
                                           capsys):
        self._tiny(monkeypatch)
        jsonl = _write_jsonl(tmp_path, [SAMPLE])
        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["table-eval", jsonl, "--img-root", str(tmp_path),
                       "--image-size", "64", "--split", "nope"])
        assert rc == 1


@pytest.mark.slow
class TestTableOverfit:
    def test_overfits_steds(self, tmp_path):
        """Task-metric overfit proof for the TR surface (VERDICT r4 item 4
        pattern): the real table train path (PubTabNet jsonl →
        omniparser_table_batches → fit) takes a tiny OmniParser to
        S-TEDS == 1.0 on its one synthetic table via the full
        autoregressive infer_vie → decode_table_outputs pipeline."""
        import jax
        import jax.numpy as jnp
        import optax

        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.engine import batches as B
        from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
        from advancedliteratemachinery_tpu.models.omniparser import (
            OmniParser, OmniParserConfig)
        from advancedliteratemachinery_tpu.ops.image import normalize_crops
        from advancedliteratemachinery_tpu.parallel.mesh import create_mesh

        # 2x2 table, header row, no spans/empties — small enough for the
        # tiny decoder's pt budget (4 cells x 3 tokens + prompt + EOS).
        cellw, cellh = 46, 30
        img = Image.new("RGB", (100, 68), "white")
        from PIL import ImageDraw
        d = ImageDraw.Draw(img)
        structure = ["<thead>", "<tr>", "<td>", "</td>", "<td>", "</td>",
                     "</tr>", "</thead>", "<tbody>", "<tr>", "<td>",
                     "</td>", "<td>", "</td>", "</tr>", "</tbody>"]
        cells, shades = [], (40, 90, 140, 190)
        for i, (r, c) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            x0, y0 = 4 + c * (cellw + 4), 4 + r * (cellh + 4)
            d.rectangle([x0, y0, x0 + cellw, y0 + cellh],
                        fill=(shades[i],) * 3)
            cells.append({"tokens": [chr(ord("a") + i)],
                          "bbox": [x0, y0, x0 + cellw, y0 + cellh]})
        img.save(tmp_path / "t0.png")
        rec = {"filename": "t0.png", "split": "train",
               "html": {"structure": {"tokens": structure}, "cells": cells}}

        cfg = OmniParserConfig(
            swin_variant="tiny", d_model=32, nhead=2, dec_layers=1,
            dim_feedforward=64, num_bins=50, max_position_embeddings=64,
            pt_seq_length=24, poly_length=8, rec_length=6, max_instances=4,
            drop_path_rate=0.0, vie_categories=N_TABLE_CLASSES)
        v = cfg.vocab()
        model = OmniParser(cfg, policy=FP32_POLICY)
        ds = PubTabNetDataset(_write_jsonl(tmp_path, [rec]),
                              str(tmp_path), chars=v.chars,
                              rec_length=cfg.rec_length)
        it = B.omniparser_table_batches(
            ds, v, batch_size=2, image_hw=(64, 64), max_pt_body=12,
            poly_pts=cfg.poly_length // 2, rec_length=cfg.rec_length)
        seqs0 = {t: jnp.ones((1, 5), jnp.int32)
                 for t in ("pt", "poly", "rec")}
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), seqs0)["params"]
        loss_fn, _ = B.omniparser_recipe_u8(model, v.padding_index)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))

        page = ds[0]
        page_px = np.asarray(Image.open(tmp_path / "t0.png").convert("RGB")
                             .resize((64, 64)), np.uint8)
        infer = jax.jit(lambda p, x: model.apply(
            {"params": p}, normalize_crops(x, dtype=jnp.float32),
            method=model.infer_vie))
        steds = TEDS(structure_only=True)
        teds = TEDS()
        best = {"s": 0.0, "full": 0.0}

        def eval_fn(state):
            out = jax.tree_util.tree_map(
                np.asarray, infer(state.params, jnp.asarray(page_px[None])))
            res = decode_table_outputs(out, v, page["orig_size"])
            best["s"] = max(best["s"], steds.evaluate(
                res["structure_html"], page["gt_html"]))
            best["full"] = max(best["full"], teds.evaluate(
                res["html"], page["gt_html"]))
            return {"steds": best["s"], "teds": best["full"]}

        fit(loss_fn, tx, params, it,
            FitConfig(total_steps=800, log_interval=200, val_interval=50),
            mesh=create_mesh(data=1, devices=jax.devices()[:1]),
            eval_fn=eval_fn, log_fn=lambda m: None)
        assert best["s"] == 1.0, \
            f"table structure never reached S-TEDS 1.0 ({best})"
        assert best["full"] >= 0.8, \
            f"content TEDS below 0.8 ({best})"

"""FUNSD preprocessing parity: raw annotation tree → preprocessed page
jsons with the reference's schema (preprocess/funsd_el/preprocess.py),
consumable by engine.batches.vie_batches."""

import json
import os

import numpy as np
import pytest

from advancedliteratemachinery_tpu.data.funsd import (
    CLASSES, preprocess_funsd, preprocess_funsd_page)


def _toy_tokenize(word):
    # deterministic 1-2 tokens per word (stands in for wordpiece)
    return [len(word)] if len(word) < 5 else [len(word), 99]


RAW = {
    "form": [
        {"id": 0, "text": "Date:", "label": "question",
         "box": [10, 10, 60, 30],
         "words": [{"text": "Date:", "box": [10, 10, 60, 30]}],
         "linking": [[0, 1]]},
        {"id": 1, "text": "03 Mar", "label": "answer",
         "box": [70, 10, 130, 30],
         "words": [{"text": "03", "box": [70, 10, 90, 30]},
                   {"text": "Mar", "box": [95, 10, 130, 30]}],
         "linking": [[0, 1]]},
        {"id": 2, "text": "", "label": "other", "box": [0, 0, 1, 1],
         "words": [{"text": "", "box": [0, 0, 1, 1]}], "linking": []},
        {"id": 3, "text": "ignore me", "label": "other",
         "box": [0, 50, 40, 70],
         "words": [{"text": "ignore", "box": [0, 50, 20, 70]},
                   {"text": "me", "box": [22, 50, 40, 70]}],
         "linking": []},
    ]
}


class TestPreprocessPage:
    def test_schema_and_indices(self):
        out = preprocess_funsd_page(RAW, _toy_tokenize, "/img/p.png",
                                    (200, 100))
        # 5 words survive (empty filtered): Date:, 03, Mar, ignore, me
        assert [w["text"] for w in out["words"]] == \
            ["Date:", "03", "Mar", "ignore", "me"]
        # tokens via the injected tokenizer
        assert out["words"][0]["tokens"] == [5, 99]
        # 4-point boxes from LTRB
        assert out["words"][1]["boundingBox"] == \
            [[70, 10], [90, 10], [90, 30], [70, 30]]
        # first_token_idx is 1-based past [CLS]: block starts at tokens
        # 1 ('Date:' has 2 toks), 3, 5 ('ignore' 2 toks)
        assert out["blocks"]["first_token_idx_list"] == [1, 3, 5]
        assert len(out["blocks"]["boxes"]) == 3
        # classes: question = [word 0], answer = [words 1,2]; O gets
        # nothing (label 'other' → 'O' is not a valid entity class...
        # reference keeps 'O' in CLASSES and appends there)
        assert out["parse"]["class"]["QUESTION"] == [[0]]
        assert out["parse"]["class"]["ANSWER"] == [[1, 2]]
        # link (0 → 1) maps to first-word indices (0 → 1)
        assert out["parse"]["relations"] == [[0, 1]]
        assert out["meta"]["imageSize"] == {"width": 200, "height": 100}
        assert out["meta"]["width"] == 200

    def test_o_label_goes_to_o_class(self):
        out = preprocess_funsd_page(RAW, _toy_tokenize, "p", (10, 10))
        assert out["parse"]["class"]["O"] == [[3, 4]]


class TestPreprocessTree:
    def test_end_to_end_feeds_vie_batches(self, tmp_path):
        # lay out a raw FUNSD tree with 1 train + 1 val page
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "date", ":", "03", "mar",
             "ignore", "me"]))
        from PIL import Image
        for sub in ("training_data", "testing_data"):
            (tmp_path / sub / "annotations").mkdir(parents=True)
            (tmp_path / sub / "images").mkdir()
            (tmp_path / sub / "annotations" / "p0.json").write_text(
                json.dumps(RAW))
            Image.new("RGB", (200, 100)).save(
                tmp_path / sub / "images" / "p0.png")
        out_dir = tmp_path / "geo"
        written = preprocess_funsd(str(tmp_path), str(out_dir),
                                   vocab_file=str(vocab), log=lambda *_: None)
        assert len(written["train"]) == 1 and len(written["val"]) == 1
        assert (out_dir / "class_names.txt").read_text().split("\n") == \
            CLASSES
        listed = (out_dir / "preprocessed_files_train.txt").read_text()
        assert listed == os.path.join("preprocessed", "p0.json")

        page = json.loads((out_dir / "preprocessed" / "p0.json").read_text())
        # real wordpiece ids from the toy vocab: 'Date:' → date(4), :(5)
        assert page["words"][0]["tokens"] == [4, 5]

        # the output drives vie_batches end to end
        from advancedliteratemachinery_tpu.engine.batches import (
            VIEPreprocessedDataset, vie_batches)
        ds = VIEPreprocessedDataset(str(out_dir / "preprocessed"))
        b = next(vie_batches(ds, batch_size=2, max_seq=16, max_blocks=4,
                             image_size=32))
        assert b["input_ids"].shape == (2, 16)
        assert b["image"].shape == (2, 32, 32, 3)
        assert b["image"].max() >= 0  # page image was found and loaded
        assert b["first_token_idxes"][0, 0] == 1

    def test_cli_entry(self, tmp_path):
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]",
                                    "date"]))
        from PIL import Image
        for sub in ("training_data", "testing_data"):
            (tmp_path / sub / "annotations").mkdir(parents=True)
            (tmp_path / sub / "images").mkdir()
            (tmp_path / sub / "annotations" / "a.json").write_text(
                json.dumps(RAW))
            Image.new("RGB", (50, 40)).save(
                tmp_path / sub / "images" / "a.png")
        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["preprocess-funsd", str(tmp_path),
                       str(tmp_path / "out"), "--vocab", str(vocab)])
        assert rc == 0
        assert (tmp_path / "out" / "preprocessed" / "a.json").exists()

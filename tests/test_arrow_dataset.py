"""pyarrow SynthText shard round-trip with the REAL pyarrow library
(VLPT-STD write_synthtext_pyarrow.py + dataset.py:42)."""

import io

import numpy as np
import pytest

from advancedliteratemachinery_tpu.data.arrow_dataset import (
    MLMSpec, SynthTextArrowDataset, write_synthtext_arrow)

pytestmark = pytest.mark.fast


def _png_bytes(color):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), color).save(buf, "PNG")
    return buf.getvalue()


@pytest.fixture()
def shard(tmp_path):
    path = str(tmp_path / "synthtext_train.arrow")
    write_synthtext_arrow(
        [(_png_bytes((255, 0, 0)), "hello world", "img0"),
         (_png_bytes((0, 255, 0)), "quick brown fox", "img1")], path)
    return path


def _spec():
    # toy wordpiece-ish tokenizer: 10 + word index; ids >= 500 = subwords
    vocab = {}

    def encode(text):
        out = []
        for w in text.split():
            if w not in vocab:
                vocab[w] = 10 + len(vocab)
            out.append(vocab[w])
            out.append(500 + vocab[w])      # a fake '##' continuation
        return out

    return MLMSpec(encode=encode, cls_id=1, sep_id=2, mask_id=3, pad_id=0,
                   vocab_size=600, is_subword=lambda i: i >= 500)


def test_roundtrip_images_and_texts(shard):
    ds = SynthTextArrowDataset(shard, _spec(), image_size=16, max_text_len=12)
    assert len(ds) == 2
    img = ds.get_image(0)
    assert img.shape == (16, 16, 3)
    assert img[..., 0].mean() > 0.9 and img[..., 1].mean() < 0.1  # red
    assert ds.texts == ["hello world", "quick brown fox"]


def test_batch_shapes_and_mlm_invariants(shard):
    ds = SynthTextArrowDataset(shard, _spec(), image_size=16, max_text_len=12)
    b = ds.batch([0, 1], rng=np.random.default_rng(0))
    assert b["image"].shape == (2, 16, 16, 3)
    for k in ("text_ids", "text_ids_mlm", "text_labels_mlm", "text_masks"):
        assert b[k].shape == (2, 12)
    # labels only at changed-or-kept masked positions; CLS/SEP/PAD never
    for r in range(2):
        ids, mlm, lab, mask = (b["text_ids"][r], b["text_ids_mlm"][r],
                               b["text_labels_mlm"][r], b["text_masks"][r])
        sel = lab != -100
        assert sel.any()
        assert (lab[sel] == ids[sel]).all()
        assert not sel[ids == 1].any() and not sel[ids == 2].any()
        assert (mlm[~sel] == ids[~sel]).all()      # unmasked unchanged


def test_whole_word_masks_continuations_together(shard):
    ds = SynthTextArrowDataset(shard, _spec(), image_size=16, max_text_len=12,
                               mlm_prob=0.3)
    b = ds.batch([0], rng=np.random.default_rng(1))
    ids = b["text_ids"][0]
    lab = b["text_labels_mlm"][0]
    # wherever a word-start is selected, its '##' continuation is too
    for i in range(len(ids) - 1):
        if lab[i] != -100 and 10 <= ids[i] < 500 and ids[i + 1] >= 500:
            assert lab[i + 1] != -100

import numpy as np
import pytest

from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
from advancedliteratemachinery_tpu.codecs.subword import (
    BpeCodec,
    WordpieceCodec,
    bytes_to_unicode,
)


class TestCharCodec:
    def test_roundtrip(self):
        codec = CharCodec()
        lengths, ids = codec.encode(["hello", "w0rld"])
        assert ids.shape == (2, 27)
        assert lengths.tolist() == [5, 5]
        # row = [GO, h, e, l, l, o, EOS, GO...]
        assert ids[0, 0] == 0 and ids[0, 6] == 1
        decoded = codec.decode(ids[:, 1:])
        assert decoded == ["hello", "w0rld"]

    def test_encode_layout_matches_reference(self):
        # reference utils.py:37-49: [GO] + chars + [s], GO(0)-padded
        codec = CharCodec("ab", batch_max_length=4)
        _, ids = codec.encode(["ab"])
        assert ids[0].tolist() == [0, 2, 3, 1, 0, 0]

    def test_too_long_raises(self):
        codec = CharCodec(batch_max_length=3)
        with pytest.raises(ValueError):
            codec.encode(["abcd"])

    def test_greedy_confidence(self):
        import jax.numpy as jnp

        codec = CharCodec("ab", batch_max_length=3)
        # logits [1, T=5, C=4]; positions 1..4 decoded
        logits = np.full((1, 5, 4), -10.0, dtype=np.float32)
        logits[0, 1, 2] = 10.0  # 'a'
        logits[0, 2, 1] = 10.0  # EOS
        logits[0, 3, 0] = 10.0
        logits[0, 4, 0] = 10.0
        pred, conf = CharCodec.greedy_with_confidence(jnp.asarray(logits))
        assert codec.decode(np.asarray(pred)) == ["a"]
        assert 0.9 < float(conf[0]) <= 1.0

    def test_no_eos_zero_confidence(self):
        import jax.numpy as jnp

        logits = np.full((1, 4, 4), -10.0, dtype=np.float32)
        logits[:, :, 2] = 10.0  # never EOS
        _, conf = CharCodec.greedy_with_confidence(jnp.asarray(logits))
        assert float(conf[0]) == 0.0


def _toy_bpe():
    # byte-level alphabet for ascii letters + merges building "he", "ll", "hell"
    b2u = bytes_to_unicode()
    toks = [b2u[b] for b in range(256)]
    vocab = {t: i + 10 for i, t in enumerate(toks)}
    for extra in ["he", "ll", "hell", "hello", "Ġhe"]:
        vocab[extra] = len(vocab) + 10
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"), ("Ġ", "he")]
    return BpeCodec(vocab, merges, batch_max_length=8)


class TestBpeCodec:
    def test_merge_order(self):
        codec = _toy_bpe()
        ids = codec.encode_text("hello")
        assert [codec.decoder[i] for i in ids] == ["hello"]

    def test_pretokenize_space_prefix(self):
        codec = _toy_bpe()
        ids = codec.encode_text("he he")
        toks = [codec.decoder[i] for i in ids]
        assert toks == ["he", "Ġhe"]

    def test_roundtrip(self):
        codec = _toy_bpe()
        ids = codec.encode_text("hello hello")
        assert codec.decode_ids(ids) == "hello hello"

    def test_batch_layout(self):
        codec = _toy_bpe()
        out = codec.encode(["hello"])
        assert out.shape == (1, 10)
        assert out[0, 0] == 1  # SOS
        row = out[0].tolist()
        assert 2 in row  # EOS
        assert row[row.index(2) + 1 :] == [0] * (len(row) - row.index(2) - 1)


def _toy_wp():
    vocab = {"[PAD]": 0, "[UNK]": 100, "[CLS]": 101, "[SEP]": 102,
             "hell": 5, "##o": 6, "wor": 7, "##ld": 8, "a": 9}
    return WordpieceCodec(vocab, batch_max_length=8)


class TestWordpieceCodec:
    def test_greedy_longest_match(self):
        codec = _toy_wp()
        ids = codec.encode_text("hello world")
        assert ids == [5, 6, 7, 8]

    def test_unk(self):
        codec = _toy_wp()
        assert codec.encode_text("zzz") == [100]

    def test_batch_and_decode(self):
        codec = _toy_wp()
        out = codec.encode(["hello"])
        assert out[0, 0] == 101 and out[0].tolist().count(102) == 1
        # decode joins subwords and strips whitespace
        texts = codec.decode(np.array([[101, 5, 6, 102, 0]]))
        assert texts[0].startswith("[CLS]hello[SEP]")

    def test_lowercase(self):
        codec = _toy_wp()
        assert codec.encode_text("HELLO") == codec.encode_text("hello")


class TestVocabFileLoaders:
    """from_files/from_file round trips over STR-style labels using
    format-exact synthetic vocab files (the real GPT-2/BERT files are
    fetched by scripts/fetch_vocabs.py — no egress in this image)."""

    def _write_gpt2_files(self, tmp_path):
        # a tiny byte-BPE vocab able to encode lowercase alnum words
        import json as _json
        from advancedliteratemachinery_tpu.codecs.subword import bytes_to_unicode
        b2u = bytes_to_unicode()
        base = [b2u[b] for b in range(256)]
        merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
                  ("1", "2"), ("12", "3")]
        vocab = {}
        for i, t in enumerate(base):
            vocab[t] = i
        for a, b in merges:
            vocab[a + b] = len(vocab)
        vj = tmp_path / "vocab.json"
        mt = tmp_path / "merges.txt"
        vj.write_text(_json.dumps(vocab), encoding="utf-8")
        mt.write_text("#version: 0.2\n" + "\n".join(
            f"{a} {b}" for a, b in merges) + "\n", encoding="utf-8")
        return str(vj), str(mt)

    def test_bpe_from_files_round_trip(self, tmp_path):
        from advancedliteratemachinery_tpu.codecs.subword import BpeCodec
        vj, mt = self._write_gpt2_files(tmp_path)
        codec = BpeCodec.from_files(vj, mt)
        labels = ["hello", "123", "hello123", "x9z"]
        ids = codec.encode(labels)
        assert ids.shape == (4, codec.max_tokens)
        for lab, row in zip(labels, ids):
            # strip sos/eos/pad, decode back
            body = [int(t) for t in row if t not in
                    (codec.sos_id, codec.eos_id, codec.pad_id)]
            assert codec.decode_ids(body) == lab

    def test_bpe_merges_applied(self, tmp_path):
        from advancedliteratemachinery_tpu.codecs.subword import BpeCodec
        vj, mt = self._write_gpt2_files(tmp_path)
        codec = BpeCodec.from_files(vj, mt)
        # "hello" must collapse through he+ll -> hell -> hello (1 token)
        assert len(codec.encode_text("hello")) == 1

    def test_wordpiece_from_file_round_trip(self, tmp_path):
        from advancedliteratemachinery_tpu.codecs.subword import WordpieceCodec
        toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "##123",
                "wor", "##ld", "a"]
        vt = tmp_path / "vocab.txt"
        vt.write_text("\n".join(toks) + "\n", encoding="utf-8")
        codec = WordpieceCodec.from_file(str(vt))
        assert codec.cls_id == 2 and codec.sep_id == 3 and codec.pad_id == 0
        ids = codec.encode(["hello123", "world"])
        texts = codec.decode(ids)
        # decode renders specials literally (utils.py:81-88 semantics):
        # prune at [SEP], strip the leading [CLS]
        def body(t):
            return t.split("[SEP]")[0].replace("[CLS]", "")
        assert body(texts[0]) == "hello123"
        assert body(texts[1]) == "world"

    def test_default_loaders_give_actionable_error(self):
        import pytest as _pytest
        from advancedliteratemachinery_tpu.codecs.subword import (
            BpeCodec, WordpieceCodec)
        import os as _os
        assets = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "advancedliteratemachinery_tpu",
            "assets")
        if _os.path.exists(_os.path.join(assets, "gpt2_vocab.json")):
            assert BpeCodec.default() is not None
        else:
            with _pytest.raises(FileNotFoundError, match="fetch_vocabs"):
                BpeCodec.default()
        if _os.path.exists(_os.path.join(assets, "bert_base_uncased_vocab.txt")):
            assert WordpieceCodec.default() is not None
        else:
            with _pytest.raises(FileNotFoundError, match="fetch_vocabs"):
                WordpieceCodec.default()

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

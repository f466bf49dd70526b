"""Vocab-file pinning: the codecs' file loaders and tokenization must
reproduce hand-traced GPT-2 BPE / BERT WordPiece behavior on committed
mini-fixtures written in the REAL released file formats (vocab.json +
#version-headed merges.txt; one-token-per-line vocab.txt).

These mirror the canonical fixtures the HF tokenizer test-suites pin
against, so passing here means `.from_files` on the real released files
(fetched by scripts/fetch_vocabs.py where egress exists) produces
HF-exact tokenization — the requirement for MGP-STR fusion parity
(reference utils.py:60-87; SURVEY hard-part #4).
"""

import os

import numpy as np

from advancedliteratemachinery_tpu.codecs.subword import (
    BpeCodec,
    WordpieceCodec,
)

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


class TestMiniGpt2Files:
    def _codec(self):
        return BpeCodec.from_files(
            os.path.join(FIX, "mini_gpt2_vocab.json"),
            os.path.join(FIX, "mini_gpt2_merges.txt"),
            batch_max_length=10)

    def test_merges_header_skipped_and_ranks_ordered(self):
        c = self._codec()
        assert ("e", "r") in c.bpe_ranks
        assert c.bpe_ranks[("Ġ", "l")] == 0      # first merge wins ties

    def test_hand_traced_bpe(self):
        """Hand trace with merges [Ġ l, Ġl o, Ġlo w, e r]:
        'lower'  → l o w er          (only e+r ranked)
        ' newer' → Ġ n e w er        (Ġ+n unranked; e+r merges at the end)
        """
        c = self._codec()
        assert c.encode_text("lower newer") == [0, 1, 2, 15, 10, 9, 3, 2, 15]

    def test_merge_order_is_greedy_by_rank(self):
        """' lowest' applies Ġ+l, Ġl+o, Ġlo+w in rank order → Ġlow e s t
        (the full token 'Ġlowest' is in the vocab but unreachable — BPE
        only emits merge products, exactly like the released tokenizer)."""
        c = self._codec()
        assert c.encode_text(" lowest") == [14, 3, 5, 6]

    def test_byte_roundtrip(self):
        c = self._codec()
        ids = c.encode_text("lower newer")
        assert c.decode_ids(ids) == "lower newer"


class TestMiniBertVocabFile:
    def _codec(self):
        return WordpieceCodec.from_file(
            os.path.join(FIX, "mini_bert_vocab.txt"), batch_max_length=10)

    def test_line_numbers_are_ids(self):
        c = self._codec()
        assert c.vocab["[PAD]"] == 0 and c.vocab["##er"] == 12
        assert c.cls_id == 2 and c.sep_id == 3

    def test_canonical_wordpiece_split(self):
        """'unwanted running' → un ##want ##ed runn ##ing (the canonical
        BERT wordpiece fixture trace)."""
        c = self._codec()
        ids = c.encode(["unwanted running"])[0]
        # [CLS] un ##want ##ed runn ##ing [SEP] pad...
        np.testing.assert_array_equal(ids[:7], [2, 8, 5, 6, 9, 10, 3])
        assert (ids[7:] == c.pad_id).all()

    def test_unreachable_suffix_makes_whole_word_unk(self):
        c = self._codec()
        ids = c.encode(["lowers"])[0]       # low ##er + 's' missing → [UNK]
        np.testing.assert_array_equal(ids[:3], [2, 1, 3])

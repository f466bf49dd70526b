#!/usr/bin/env python
"""Fetch the standard tokenizer vocabularies MGP-STR's bpe/wp heads use.

The reference relies on HuggingFace `GPT2Tokenizer` / `BertTokenizer`
(OCR/MGP-STR/utils.py:23-24), whose data files are small public artifacts.
This build environment has no network egress, so the files cannot be
vendored into the repo; run this script once wherever egress exists:

    python scripts/fetch_vocabs.py

It downloads into `advancedliteratemachinery_tpu/assets/`, where
`BpeCodec.default()` / `WordpieceCodec.default()` pick them up
automatically. Basic integrity is checked via exact entry counts
(GPT-2: 50257 vocab entries / 50000 merges; BERT-uncased: 30522 lines).
"""

import json
import os
import sys
import urllib.request

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "advancedliteratemachinery_tpu", "assets")

FILES = [
    # (url, filename, validator)
    ("https://huggingface.co/gpt2/resolve/main/vocab.json",
     "gpt2_vocab.json",
     lambda p: len(json.load(open(p, encoding="utf-8"))) == 50257),
    ("https://huggingface.co/gpt2/resolve/main/merges.txt",
     "gpt2_merges.txt",
     lambda p: sum(1 for line in open(p, encoding="utf-8")
                   if line.strip() and not line.startswith("#")) == 50000),
    ("https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt",
     "bert_base_uncased_vocab.txt",
     lambda p: sum(1 for _ in open(p, encoding="utf-8")) == 30522),
]


def main() -> int:
    os.makedirs(ASSETS, exist_ok=True)
    ok = True
    for url, name, validate in FILES:
        dst = os.path.join(ASSETS, name)
        if os.path.exists(dst) and validate(dst):
            print(f"{name}: already present, valid")
            continue
        print(f"fetching {url} -> {dst}")
        urllib.request.urlretrieve(url, dst)
        if not validate(dst):
            print(f"ERROR: {name} failed validation (wrong entry count)")
            ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

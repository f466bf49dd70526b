"""Raw FUNSD → GeoLayoutLM-preprocessed page jsons.

Parity target: reference GeoLayoutLM preprocess/funsd_el/preprocess.py —
per page json it emits blocks.first_token_idx_list / blocks.boxes,
words[].{text,tokens,boundingBox}, parse.class[...] word-index sequences,
parse.relations entity-link pairs (first-word indices), and
meta.{image_path,imageSize,voca}; plus preprocessed_files_{split}.txt
lists and class_names.txt. The output feeds engine.batches.vie_batches
(the reference's vie_dataset.py `_getitem_geo` equivalent).

Differences from the reference script: the BERT tokenizer is the
package's WordpieceCodec (identical uncased basic+wordpiece behavior);
image paths are written absolute instead of copying the image tree next
to the output; image sizes come from PIL instead of `imagesize`.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional

CLASSES = ["O", "HEADER", "QUESTION", "ANSWER"]


def preprocess_funsd_page(in_json: Dict, tokenize, image_path: str,
                          image_size) -> Dict:
    """One raw FUNSD annotation → preprocessed page object
    (preprocess.py:52-137). `tokenize(word_text) -> List[int]`."""
    out: Dict = {
        "blocks": {"first_token_idx_list": [], "boxes": []},
        "words": [],
        "parse": {"class": {c: [] for c in CLASSES}, "relations": []},
    }
    form_id_to_word_idx: Dict[int, int] = {}
    num_tokens = 0

    for form in in_json["form"]:
        form_text = form["text"].strip()
        form_label = form["label"].upper()
        if form_label.startswith("O"):
            form_label = "O"
        if len(form_text) == 0:
            continue  # filter text blocks with empty text

        word_cnt = 0
        class_seq: List[int] = []
        real_word_idx = 0
        for word in form["words"]:
            word_text = word["text"]
            if len(word_text) == 0:  # filter empty words
                continue
            bb = word["box"]
            bb = [[bb[0], bb[1]], [bb[2], bb[1]],
                  [bb[2], bb[3]], [bb[0], bb[3]]]
            tokens = tokenize(word_text)
            out["words"].append(
                {"text": word_text, "tokens": tokens, "boundingBox": bb})
            if real_word_idx == 0:
                # +1: token 0 is [CLS] in the training sequence
                out["blocks"]["first_token_idx_list"].append(num_tokens + 1)
            num_tokens += len(tokens)
            word_cnt += 1
            class_seq.append(len(out["words"]) - 1)
            real_word_idx += 1
        if real_word_idx > 0:
            out["blocks"]["boxes"].append(form["box"])

        if form_label in CLASSES:
            out["parse"]["class"][form_label].append(class_seq)
            form_id_to_word_idx[form["id"]] = len(out["words"]) - word_cnt

    # entity links: (from-entity first word idx, to-entity first word idx)
    for form in in_json["form"]:
        for link in form.get("linking", []):
            if link[0] == form["id"] and link[0] in form_id_to_word_idx \
                    and link[1] in form_id_to_word_idx:
                out["parse"]["relations"].append(
                    [form_id_to_word_idx[link[0]],
                     form_id_to_word_idx[link[1]]])

    w, h = image_size
    out["meta"] = {
        "image_path": image_path,
        "imageSize": {"width": w, "height": h},
        # flat duplicates for engine.batches.vie_batches' native schema
        "width": w, "height": h,
        "voca": "bert-base-uncased",
    }
    return out


def preprocess_funsd(input_path: str, output_path: str,
                     vocab_file: Optional[str] = None,
                     log=print) -> Dict[str, List[str]]:
    """Preprocess a raw FUNSD tree (training_data/ + testing_data/, each
    with annotations/ and images/) into `output_path` (preprocess.py:27).
    Returns {split: [preprocessed json paths]}."""
    from advancedliteratemachinery_tpu.codecs.subword import WordpieceCodec

    codec = (WordpieceCodec.from_file(vocab_file) if vocab_file
             else WordpieceCodec.default())
    from PIL import Image

    os.makedirs(os.path.join(output_path, "preprocessed"), exist_ok=True)
    written: Dict[str, List[str]] = {}
    for split, sub in (("train", "training_data"), ("val", "testing_data")):
        files = sorted(glob.glob(
            os.path.join(input_path, sub, "annotations", "*.json")))
        names: List[str] = []
        for jf in files:
            with open(jf, encoding="utf-8") as f:
                in_json = json.load(f)
            img = os.path.splitext(
                jf.replace(os.sep + "annotations" + os.sep,
                           os.sep + "images" + os.sep))[0] + ".png"
            size = Image.open(img).size if os.path.exists(img) else (0, 0)
            out = preprocess_funsd_page(
                in_json, codec.encode_text, os.path.abspath(img), size)
            name = os.path.basename(jf)
            dst = os.path.join(output_path, "preprocessed", name)
            with open(dst, "w", encoding="utf-8") as f:
                json.dump(out, f, ensure_ascii=False)
            names.append(os.path.join("preprocessed", name))
        with open(os.path.join(output_path,
                               f"preprocessed_files_{split}.txt"),
                  "w", encoding="utf-8") as f:
            f.write("\n".join(names))
        written[split] = names
        log(f"[preprocess-funsd] {split}: {len(names)} pages")
    with open(os.path.join(output_path, "class_names.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(CLASSES))
    return written

"""VIE (KIE) spotting datasets for OmniParser training.

Parity target: reference OCR/OmniParser/dataset/cord.py and sroie.py —
receipt pages annotated with per-line `category`, per-word `quad` boxes
and `text`; words flagged `is_key` are dropped (CORD keys are not read
targets, cord.py:118-120). Each page yields word-level read targets
(center, polygon, rec char ids) plus entity instances whose class tokens
are appended to the reading-order point sequence
(cord.py:210-238 sorted_instance_pts):

- cord-style (`group_words=True`): all word centers of an entity, then
  ONE class token (cord.py:231-237);
- sroie-style (`group_words=False`): every word center is followed by
  the class token (sroie.py:222-229) — strict (x, y, class) triplets,
  which is also what the inference-time period-3 masking decodes.

The annotation schema accepted here is the CORD-v2 page json:
{"valid_line": [{"category": str, "words": [{"quad": {x1..y4},
"text": str, "is_key": 0/1}]}]}.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def quad_polygon(quad: np.ndarray, pts_per_side: int = 8) -> np.ndarray:
    """Quad [4,2] (tl, tr, br, bl) → [2*pts_per_side, 2] polygon sampled
    along the top edge then the bottom edge (the reference fits a bezier
    through the straight quad edges and resamples — gen_bezier_ctrl_points
    + bezier2polygon — which for straight edges is linear interpolation)."""
    t = np.linspace(0.0, 1.0, pts_per_side)[:, None]
    top = quad[0] * (1 - t) + quad[1] * t
    bottom = quad[2] * (1 - t) + quad[3] * t
    return np.concatenate([top, bottom], axis=0)


class CordLikeVieDataset:
    """Directory (or list) of CORD-v2-style page jsons + images.

    Item dict: file_name, image_folder, orig_size (h, w),
    words: [{center [2], quad [4,2], rec [char ids]}],
    instances: [{word_idxs, class_idx, center [2]}].
    """

    def __init__(self, anns: str, image_folder: str,
                 class_names: Sequence[str], chars: str,
                 group_words: bool = True):
        if os.path.isdir(anns):
            files = sorted(glob.glob(os.path.join(anns, "*.json")))
        else:
            files = [anns]
        self.image_folder = image_folder
        self.class_names = list(class_names)
        self.chars = chars
        self.group_words = group_words
        self.pages = []
        for f in files:
            with open(f, encoding="utf-8") as fh:
                self.pages.append((os.path.basename(f), json.load(fh)))

    def __len__(self) -> int:
        return len(self.pages)

    def _rec_ids(self, text: str) -> List[int]:
        # chars_dict lookup with unknown → len(chars) (cord.py:80-86)
        return [self.chars.find(c) if self.chars.find(c) >= 0
                else len(self.chars) for c in text]

    def __getitem__(self, idx: int) -> Dict:
        name, gt = self.pages[idx]
        words = []
        instances = []
        for line in gt["valid_line"]:
            cat = line["category"]
            if cat not in self.class_names:
                continue
            cls_idx = self.class_names.index(cat)
            word_idxs = []
            lo = np.array([np.inf, np.inf])
            hi = np.array([-np.inf, -np.inf])
            for w in line["words"]:
                if w.get("is_key", 0) == 1 or len(w["text"]) == 0:
                    continue
                q = w["quad"]
                quad = np.array([[q["x1"], q["y1"]], [q["x2"], q["y2"]],
                                 [q["x3"], q["y3"]], [q["x4"], q["y4"]]],
                                np.float64)
                words.append({
                    "center": quad.mean(axis=0),
                    "quad": quad,
                    "rec": self._rec_ids(w["text"]),
                })
                word_idxs.append(len(words) - 1)
                lo = np.minimum(lo, quad.min(axis=0))
                hi = np.maximum(hi, quad.max(axis=0))
            if not word_idxs:
                continue
            instances.append({
                "word_idxs": word_idxs,
                "class_idx": cls_idx,
                "center": (lo + hi) / 2.0,
            })

        meta = gt.get("meta", {})
        size = meta.get("image_size", {})
        h = size.get("height") or int(
            max((w["quad"][:, 1].max() for w in words), default=1000))
        w_ = size.get("width") or int(
            max((w["quad"][:, 0].max() for w in words), default=1000))
        return {
            "file_name": name.replace(".json", ".png"),
            "image_folder": self.image_folder,
            "orig_size": (h, w_),
            "words": words,
            "instances": instances,
            "group_words": self.group_words,
        }


def build_vie_pt_sequence(page: Dict, vocab, max_tokens: Optional[int] = None
                          ) -> np.ndarray:
    """Reading-order VIE point sequence (cord.py:210-238): instances
    sorted by quantized (y, x) center; per instance its word-center bin
    pairs — each followed by the class token in sroie style, one trailing
    class token in cord style. Class token id = vie_class_base + class."""
    h, w = page["orig_size"]
    if not page["instances"]:
        return np.zeros(0, np.int64)
    centers = np.stack([i["center"] for i in page["instances"]])
    icx = vocab.quantize(centers[:, 0], w)
    icy = vocab.quantize(centers[:, 1], h)
    order = np.lexsort((icx, icy))

    out: List[int] = []
    for k in order:
        inst = page["instances"][k]
        cls_tok = vocab.vie_class_base + inst["class_idx"]
        for wi in inst["word_idxs"]:
            c = page["words"][wi]["center"]
            out.append(int(vocab.quantize(c[0], w)))
            out.append(int(vocab.quantize(c[1], h)))
            if not page.get("group_words", True):
                out.append(cls_tok)
        if page.get("group_words", True):
            out.append(cls_tok)
    seq = np.asarray(out, np.int64)
    return seq[:max_tokens] if max_tokens else seq

"""SynthText pyarrow-shard dataset (VLPT-STD pretraining data path).

Behavioral parity target: reference OCR/VLPT-STD —
`write_synthtext_pyarrow.py` serializes (image bytes, [caption],
image_id, split) rows into a RecordBatchFile per split, and
`dataset.py:42 SynthTextDataset` memory-maps it back, decoding images
from bytes and building MLM batches with a BERT-style collator (whole-
word masking by default, mlm_prob 0.15).

This module uses the REAL pyarrow library (available in this image), so
the round-trip test is a genuine golden-format check. The MLM collator is
a self-contained whole-word-mask implementation producing the batch dict
models/vlpt.py consumes: image, text_ids, text_ids_mlm, text_labels_mlm,
text_masks.
"""

from __future__ import annotations

import dataclasses
import io
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def write_synthtext_arrow(samples: Sequence[Tuple[bytes, str, str]],
                          path: str) -> None:
    """samples: (image_bytes, caption, image_id) rows → RecordBatchFile
    with the reference schema (write_synthtext_pyarrow.py:47-58)."""
    import pyarrow as pa

    table = pa.table({
        "image": pa.array([s[0] for s in samples], pa.binary()),
        "caption": pa.array([[s[1]] for s in samples],
                            pa.list_(pa.string())),
        "image_id": pa.array([s[2] for s in samples], pa.string()),
        "split": pa.array(["train"] * len(samples), pa.string()),
    })
    with pa.OSFile(path, "wb") as sink:
        with pa.RecordBatchFileWriter(sink, table.schema) as writer:
            writer.write_table(table)


@dataclasses.dataclass
class MLMSpec:
    """Tokenizer interface + special ids for the MLM collator."""

    encode: Callable[[str], List[int]]       # WITHOUT specials
    cls_id: int = 101
    sep_id: int = 102
    mask_id: int = 103
    pad_id: int = 0
    vocab_size: int = 30522
    is_subword: Optional[Callable[[int], bool]] = None  # '##' continuation


class SynthTextArrowDataset:
    """Memory-mapped arrow reader + VLPT batch builder
    (dataset.py:42 SynthTextDataset + its mlm_collator)."""

    def __init__(self, path: str, mlm: MLMSpec, image_size: int = 512,
                 max_text_len: int = 30, mlm_prob: float = 0.15,
                 whole_word_masking: bool = True):
        import pyarrow as pa

        self.table = pa.ipc.RecordBatchFileReader(
            pa.memory_map(path, "r")).read_all()
        self.texts = [c[0] for c in
                      self.table["caption"].to_pylist()]
        self.mlm = mlm
        self.image_size = image_size
        self.max_text_len = max_text_len
        self.mlm_prob = mlm_prob
        self.whole_word = whole_word_masking

    def __len__(self) -> int:
        return len(self.texts)

    def get_image(self, index: int) -> np.ndarray:
        """Decoded RGB image resized to the square model input, in [0,1]."""
        import cv2
        from PIL import Image

        raw = self.table["image"][index].as_py()
        img = Image.open(io.BytesIO(raw)).convert("RGB")
        arr = np.asarray(img, np.float32) / 255.0
        return cv2.resize(arr, (self.image_size, self.image_size))

    def _encode(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        ids = [self.mlm.cls_id] + self.mlm.encode(text)[: self.max_text_len - 2] \
            + [self.mlm.sep_id]
        mask = np.zeros((self.max_text_len,), np.int32)
        mask[: len(ids)] = 1
        out = np.full((self.max_text_len,), self.mlm.pad_id, np.int32)
        out[: len(ids)] = ids
        return out, mask

    def _mask_ids(self, ids: np.ndarray, mask: np.ndarray,
                  rng: np.random.Generator
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """BERT MLM: select 15% of (whole-word grouped) positions; 80%
        [MASK], 10% random, 10% unchanged; labels -100 elsewhere."""
        L = len(ids)
        cand = [i for i in range(L)
                if mask[i] and ids[i] not in (self.mlm.cls_id,
                                              self.mlm.sep_id,
                                              self.mlm.pad_id)]
        # group subword continuations with their word starts
        groups: List[List[int]] = []
        for i in cand:
            cont = (self.mlm.is_subword is not None
                    and self.mlm.is_subword(int(ids[i])))
            if cont and self.whole_word and groups:
                groups[-1].append(i)
            else:
                groups.append([i])
        n_mask = max(1, int(round(len(cand) * self.mlm_prob)))
        order = rng.permutation(len(groups))
        picked: List[int] = []
        for g in order:
            if len(picked) >= n_mask:
                break
            picked.extend(groups[g])

        mlm_ids = ids.copy()
        labels = np.full((L,), -100, np.int64)
        for i in picked:
            labels[i] = ids[i]
            r = rng.uniform()
            if r < 0.8:
                mlm_ids[i] = self.mlm.mask_id
            elif r < 0.9:
                mlm_ids[i] = int(rng.integers(0, self.mlm.vocab_size))
        return mlm_ids, labels

    def batch(self, indices: Sequence[int],
              rng: Optional[np.random.Generator] = None
              ) -> Dict[str, np.ndarray]:
        """→ the models/vlpt.py batch dict."""
        if rng is None:
            rng = np.random.default_rng(0)
        images, ids_l, mlm_l, lab_l, mask_l = [], [], [], [], []
        for i in indices:
            images.append(self.get_image(i))
            ids, mask = self._encode(self.texts[i])
            mlm_ids, labels = self._mask_ids(ids, mask, rng)
            ids_l.append(ids)
            mlm_l.append(mlm_ids)
            lab_l.append(labels)
            mask_l.append(mask)
        return {
            "image": np.stack(images),
            "text_ids": np.stack(ids_l),
            "text_ids_mlm": np.stack(mlm_l),
            "text_labels_mlm": np.stack(lab_l),
            "text_masks": np.stack(mask_l),
        }

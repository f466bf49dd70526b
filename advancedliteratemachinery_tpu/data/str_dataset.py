"""STR datasets: LMDB reading, filtering, collation, source mixing.

Parity targets (reference OCR/MGP-STR/dataset.py):
- LmdbDataset :142 — keys num-samples / image-%09d / label-%09d, filtering
  by max length and charset, optional sensitive-case keep, rgb/grayscale.
- AlignCollate :421 — resize to (imgW, imgH) (keep-ratio + right-pad
  variant optional) and normalize to [-1, 1].
- Batch_Balanced_Dataset :30 — one loader per source with a batch-ratio
  mix, wrap-around iteration (:95 get_batch).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from advancedliteratemachinery_tpu.data.lmdb_reader import LmdbReader


class LmdbStrDataset:
    def __init__(self, path: str, charset: Optional[str] = None,
                 max_length: int = 25, rgb: bool = True,
                 sensitive: bool = False, filter_off: bool = False):
        self.reader = LmdbReader(path)
        n = self.reader.get(b"num-samples")
        self.num_samples = int(n) if n else 0
        self.charset = charset
        self.max_length = max_length
        self.rgb = rgb
        self.sensitive = sensitive
        self.indices: List[int] = []
        if filter_off:
            self.indices = list(range(1, self.num_samples + 1))
        else:
            pat = re.compile(f"[^{re.escape(charset)}]") if charset else None
            for i in range(1, self.num_samples + 1):
                label = self.reader.get(b"label-%09d" % i)
                if label is None:
                    continue
                text = label.decode("utf-8", "ignore")
                if not self.sensitive:
                    text = text.lower()
                if len(text) > self.max_length:
                    continue
                if pat is not None and pat.search(text):
                    continue
                self.indices.append(i)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        import io

        from PIL import Image

        i = self.indices[idx]
        img_bytes = self.reader.get(b"image-%09d" % i)
        label = self.reader.get(b"label-%09d" % i).decode("utf-8", "ignore")
        if not self.sensitive:
            label = label.lower()
        img = Image.open(io.BytesIO(img_bytes))
        img = img.convert("RGB" if self.rgb else "L")
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[..., None]
        return arr, label


@dataclasses.dataclass
class AlignCollate:
    """Resize word crops to (imgH, imgW) uint8 batch (dataset.py:421).
    Device-side normalization happens in ops/image.py; this stays uint8 so
    host→HBM transfer is 4x smaller than fp32."""

    img_h: int = 32
    img_w: int = 128
    keep_ratio_with_pad: bool = False

    def __call__(self, samples: Sequence[Tuple[np.ndarray, str]]
                 ) -> Tuple[np.ndarray, List[str]]:
        import cv2

        batch = np.zeros((len(samples), self.img_h, self.img_w, 3), np.uint8)
        labels = []
        for i, (img, label) in enumerate(samples):
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            if self.keep_ratio_with_pad:
                h, w = img.shape[:2]
                new_w = min(self.img_w, max(1, int(self.img_h * w / h)))
                r = cv2.resize(img, (new_w, self.img_h))
                batch[i, :, :new_w] = r
                if new_w < self.img_w:  # right-pad with the edge column
                    batch[i, :, new_w:] = r[:, -1:][:, None, :, :].squeeze(1) \
                        if r.ndim == 3 else 0
            else:
                batch[i] = cv2.resize(img, (self.img_w, self.img_h))
            labels.append(label)
        return batch, labels


@dataclasses.dataclass
class ListerCollate:
    """LISTER-style collation: keep-ratio resize into a fixed-width canvas
    plus a validity mask over the real columns (reference LISTER
    dataset/dataset.py pads variable-width crops and feeds the mask to the
    masked FocalNet encoder)."""

    img_h: int = 32
    img_w: int = 128

    def __call__(self, samples: Sequence[Tuple[np.ndarray, str]]
                 ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        import cv2

        B = len(samples)
        batch = np.zeros((B, self.img_h, self.img_w, 3), np.uint8)
        mask = np.zeros((B, self.img_h, self.img_w), np.float32)
        labels = []
        for i, (img, label) in enumerate(samples):
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            h, w = img.shape[:2]
            new_w = min(self.img_w, max(1, int(round(self.img_h * w / h))))
            batch[i, :, :new_w] = cv2.resize(img, (new_w, self.img_h))
            mask[i, :, :new_w] = 1.0
            labels.append(label)
        return batch, mask, labels


class BalancedMixer:
    """Round-robin sampler mixing multiple sources at fixed per-source batch
    fractions (dataset.py:30 Batch_Balanced_Dataset, :95 get_batch)."""

    def __init__(self, datasets: Sequence, ratios: Sequence[float],
                 batch_size: int, seed: int = 0):
        assert len(datasets) == len(ratios)
        total = sum(ratios)
        self.datasets = list(datasets)
        self.counts = [max(1, round(batch_size * r / total)) for r in ratios]
        # distribute rounding remainder to the first source
        self.counts[0] += batch_size - sum(self.counts)
        self.rng = np.random.default_rng(seed)
        self._perm = [self.rng.permutation(len(d)) for d in datasets]
        self._pos = [0] * len(datasets)

    def _next_idx(self, s: int) -> int:
        if self._pos[s] >= len(self._perm[s]):
            self._perm[s] = self.rng.permutation(len(self.datasets[s]))
            self._pos[s] = 0
        i = int(self._perm[s][self._pos[s]])
        self._pos[s] += 1
        return i

    def get_batch(self) -> List[Tuple[np.ndarray, str]]:
        out = []
        for s, c in enumerate(self.counts):
            for _ in range(c):
                out.append(self.datasets[s][self._next_idx(s)])
        return out

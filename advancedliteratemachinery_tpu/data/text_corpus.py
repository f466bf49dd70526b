"""Text-only corpus + spelling mutation for LevOCR language pretraining.

Parity target: reference OCR/LevOCR/dataset.py:344 TextDataset (one text
per line, non-alphanumeric stripped, lowercased unless sensitive) and
:432 SpellingMutation_TEXT — per word, with probability bands pn0/pn1/pn2
mutate 0/1/2/3 characters (capped by length), each mutated character
replaced / prepended / doubled / deleted by the pt0/pt1/pt2 bands.
Digit-majority words pass through untouched.
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np

_DIGITS = "0123456789"
_ALPHABETS = "abcdefghijklmnopqrstuvwxyz"


class SpellingMutation:
    """SpellingMutation_TEXT (dataset.py:432) with a seeded numpy rng."""

    def __init__(self, pn0: float = 0.1, pn1: float = 0.6, pn2: float = 0.95,
                 pt0: float = 0.25, pt1: float = 0.5, pt2: float = 0.75,
                 max_length: int = 25, seed: int = 0):
        self.pn0, self.pn1, self.pn2 = pn0, pn1, pn2
        self.pt0, self.pt1, self.pt2 = pt0, pt1, pt2
        self.max_length = max_length
        self.rng = np.random.default_rng(seed)

    def _is_digit(self, text: str, ratio: float = 0.5) -> bool:
        n = max(len(text), 1)
        return sum(c in _DIGITS for c in text) / n >= ratio

    def _num_to_modify(self, length: int) -> int:
        prob = self.rng.uniform()
        if prob < self.pn0:
            n = 0
        elif prob < self.pn1:
            n = 1
        elif prob < self.pn2:
            n = 2
        else:
            n = 3
        if length <= 4:
            return min(n, 1)
        return min(n, length // 2)

    def __call__(self, text: str) -> str:
        if self._is_digit(text):
            return text
        n = self._num_to_modify(len(text))
        if n <= 0:
            return text
        index = set(self.rng.permutation(len(text))[:n].tolist())
        chars: List[str] = []
        for i, t in enumerate(text):
            if i not in index or (t not in _DIGITS and t not in _ALPHABETS):
                chars.append(t)
                continue
            prob = self.rng.uniform()
            if prob < self.pt0:                       # replace
                chars.append(_ALPHABETS[int(self.rng.integers(0, 26))])
            elif prob < self.pt1:                     # insert before
                chars.append(_ALPHABETS[int(self.rng.integers(0, 26))])
                chars.append(t)
            elif prob < self.pt2:                     # double
                chars.append(t)
                chars.append(t)
            # else: delete
        new_text = "".join(chars[: self.max_length - 1])
        return new_text if new_text else text


class TextCorpusDataset:
    """One text per line (TextDataset, dataset.py:344): strip
    non-alphanumerics, optionally lowercase; empty lines dropped."""

    def __init__(self, path: str, sensitive: bool = False,
                 max_length: Optional[int] = 25):
        self.texts: List[str] = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                gt = re.sub("[^0-9a-zA-Z]+", "", line.strip())
                if not sensitive:
                    gt = gt.lower()
                if gt:
                    self.texts.append(gt[:max_length] if max_length else gt)

    def __len__(self) -> int:
        return len(self.texts)

    def __getitem__(self, idx: int) -> str:
        return self.texts[idx]

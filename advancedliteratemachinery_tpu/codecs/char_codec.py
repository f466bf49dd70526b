"""Character-level label codec.

Parity target: MGP-STR `TokenLabelConverter` char path (reference
OCR/MGP-STR/utils.py:9-57): vocab = ['[GO]', '[s]'] + charset; sequences are
encoded as [GO] + chars + [s], GO-padded to batch_max_length+2; decode prunes
at the first '[s]'. Also provides device-side greedy decode + cumulative
softmax confidence (test_final.py:176-200 fusion inputs).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from advancedliteratemachinery_tpu.core.registry import CODECS

DEFAULT_CHARSET = "0123456789abcdefghijklmnopqrstuvwxyz"
GO = "[GO]"
EOS = "[s]"
GO_ID = 0
EOS_ID = 1


@CODECS.register("char")
class CharCodec:
    def __init__(self, charset: str = DEFAULT_CHARSET, batch_max_length: int = 25):
        self.charset = charset
        self.itos: List[str] = [GO, EOS] + list(charset)
        self.stoi = {c: i for i, c in enumerate(self.itos)}
        self.max_tokens = batch_max_length + 2

    @property
    def num_classes(self) -> int:
        return len(self.itos)

    def encode(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """→ (lengths [B], ids [B, max_tokens]) GO-padded."""
        B = len(texts)
        ids = np.full((B, self.max_tokens), GO_ID, dtype=np.int32)
        lengths = np.zeros((B,), dtype=np.int32)
        for i, t in enumerate(texts):
            seq = [GO_ID] + [self.stoi[c] for c in t] + [EOS_ID]
            if len(seq) > self.max_tokens:
                raise ValueError(f"text '{t}' longer than batch_max_length")
            ids[i, : len(seq)] = seq
            lengths[i] = len(t)
        return lengths, ids

    def decode(self, ids: np.ndarray) -> List[str]:
        """ids [B, T] (positions AFTER the GO slot, i.e. model positions 1:).
        Prunes each row at the first EOS."""
        ids = np.asarray(ids)
        out = []
        for row in ids:
            chars = []
            for i in row:
                if i == EOS_ID:
                    break
                if i == GO_ID:
                    chars.append(GO)  # keep reference behavior: GO renders as '[GO]'
                else:
                    chars.append(self.itos[int(i)])
            out.append("".join(chars))
        return out

    @staticmethod
    def greedy_with_confidence(logits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Device-side greedy decode over char logits [B, T, C].

        Returns (pred_ids [B, T-1], confidence [B]) where confidence is the
        cumulative product of per-position max softmax probs up to and
        including the first EOS (0.0 if no EOS — matching the reference's
        except-branch at test_final.py:193-196). Position 0 ([GO]) is dropped.
        """
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1:, :]
        pred = jnp.argmax(probs, axis=-1)  # [B, T-1]
        pmax = jnp.max(probs, axis=-1)
        is_eos = pred == EOS_ID
        any_eos = jnp.any(is_eos, axis=1)
        eos_pos = jnp.argmax(is_eos, axis=1)  # first EOS
        T = pred.shape[1]
        pos = jnp.arange(T)[None, :]
        # include positions <= eos_pos in the cumulative product
        mask = pos <= eos_pos[:, None]
        conf = jnp.prod(jnp.where(mask, pmax, 1.0), axis=1)
        conf = jnp.where(any_eos, conf, 0.0)
        return pred, conf

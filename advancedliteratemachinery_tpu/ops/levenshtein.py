"""Levenshtein-edit ops for iterative sequence refinement (LevOCR/LevT).

Replaces fairseq's native `libnat`/`libnat_cuda`
(loaded at reference OCR/LevOCR/levt/levenshtein_utils.py:10-30):

Host side (train-time supervision, numpy):
- `ins_del_targets(in, out)` — align the noised sequence to the target with
  an insert/delete-only edit DP (no substitutions, fairseq "ed2" semantics)
  and emit: insertion counts per between-token slot (mask_ins targets,
  levenshtein_utils.py:33 `_get_ins_targets`), the inserted-position mask
  over the target (word_ins CE mask), and deletion labels
  (`_get_del_targets` :117).

Device side (jit-compatible, fixed shape):
- `apply_del_words`   — compact kept tokens left (levenshtein_utils.py
  `_apply_del_words`).
- `apply_ins_masks`   — insert n_j <unk> placeholders after token j
  (`_apply_ins_masks`).
- `apply_ins_words`   — fill <unk> slots with predictions
  (`_apply_ins_words`).
The reference reallocates tensors per step (dynamic lengths); here length
changes are masked reorderings in a fixed [B, L] buffer, so the whole
refinement loop stays one compiled TPU graph.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _edit_alignment(src: List[int], tgt: List[int]) -> Tuple[List[int], List[int], List[int]]:
    """Insert/delete-only edit alignment.

    Returns (kept_src: 0/1 per src token, inserted_tgt: 0/1 per tgt token,
    ins_counts: #insertions after each kept src position, len = len(src)).
    ins_counts[j] counts tgt tokens inserted between src[j] and src[j+1].
    """
    n, m = len(src), len(tgt)
    # dp[i][j] = min edits aligning src[:i] to tgt[:j]
    dp = np.zeros((n + 1, m + 1), np.int32)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            best = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1)
            if src[i - 1] == tgt[j - 1]:
                best = min(best, dp[i - 1][j - 1])
            dp[i][j] = best
    # backtrack (prefer matches, then deletion, then insertion — stable)
    kept = [0] * n
    inserted = [1] * m
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and src[i - 1] == tgt[j - 1] and dp[i][j] == dp[i - 1][j - 1]:
            kept[i - 1] = 1
            inserted[j - 1] = 0
            i, j = i - 1, j - 1
        elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
            i -= 1
        else:
            j -= 1
    # insertion counts per src slot: insertions fall after the most recent kept src token
    ins_counts = [0] * max(n, 1)
    src_kept_upto = np.cumsum(kept)  # kept count up to src idx
    # map each inserted tgt token to the slot after the previous kept token
    i, j = 0, 0
    slot = -1  # index of last consumed src position
    while j < m:
        if inserted[j]:
            ins_counts[max(slot, 0)] += 1
            j += 1
        else:
            # advance src to the next kept token
            while i < n and not kept[i]:
                i += 1
            slot = i
            i += 1
            j += 1
    return kept, inserted, ins_counts


_NATIVE_LIB = None
_NATIVE_TRIED = False


def _load_native():
    """ctypes binding to native/liblevenshtein.so (build with
    native/build.sh); the pure-Python DP below is the fallback + oracle."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    import ctypes
    import os

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "native", "liblevenshtein.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.ins_del_targets.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _NATIVE_LIB = lib
    return lib


def ins_del_targets_native(in_tokens: np.ndarray, out_tokens: np.ndarray,
                           pad: int, unk: int):
    """Native-accelerated ins_del_targets (same outputs); returns None if
    the shared library isn't built."""
    import ctypes

    lib = _load_native()
    if lib is None:
        return None
    in_t = np.ascontiguousarray(in_tokens, np.int32)
    out_t = np.ascontiguousarray(out_tokens, np.int32)
    B, Li = in_t.shape
    Lo = out_t.shape[1]
    masked = np.zeros((B, Lo), np.uint8)
    ins_t = np.zeros((B, Li - 1), np.int32)
    del_t = np.zeros((B, Li), np.int32)
    lib.ins_del_targets(
        in_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B, Li, Lo, pad,
        masked.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ins_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        del_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    masked_b = masked.astype(bool)
    masked_tgt_tokens = np.where(masked_b, unk, out_t)
    return masked_b, masked_tgt_tokens, ins_t.astype(np.int64), del_t.astype(np.int64)


def ins_del_targets(in_tokens: np.ndarray, out_tokens: np.ndarray,
                    pad: int, unk: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch supervision for LevT training.

    in_tokens [B, Li] (noised, pad-padded, bos...eos), out_tokens [B, Lo]
    (target). Returns:
      masked_tgt_masks [B, Lo] bool — target positions that were inserted
      masked_tgt_tokens [B, Lo]    — target with inserted positions → unk
      mask_ins_targets [B, Li-1]   — #insertions per between-slot (clamped 0..255)
      word_del_targets [B, Li]     — 1 where the in-token should be deleted
    """
    B, Li = in_tokens.shape
    Lo = out_tokens.shape[1]
    masked = np.zeros((B, Lo), bool)
    ins_t = np.zeros((B, Li - 1), np.int64)
    del_t = np.zeros((B, Li), np.int64)
    for b in range(B):
        src = [t for t in in_tokens[b].tolist() if t != pad]
        tgt = [t for t in out_tokens[b].tolist() if t != pad]
        kept, inserted, ins_counts = _edit_alignment(src, tgt)
        masked[b, : len(inserted)] = np.asarray(inserted, bool)
        # slots between consecutive src tokens: counts after src[j], j=0..len-2
        cnt = ins_counts[: max(len(src) - 1, 0)]
        ins_t[b, : len(cnt)] = cnt
        del_t[b, : len(kept)] = 1 - np.asarray(kept)
    ins_t = np.clip(ins_t, 0, 255)
    masked_tgt_tokens = np.where(masked, unk, out_tokens)
    return masked, masked_tgt_tokens, ins_t, del_t


# ---------------- device-side fixed-shape edit ops ----------------


def apply_del_words(tokens: jnp.ndarray, scores: jnp.ndarray,
                    del_pred: jnp.ndarray, pad: int, bos: int, eos: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Delete flagged tokens, compact left, pad tail. bos/eos protected."""
    B, L = tokens.shape
    protect = (tokens == bos) | (tokens == eos)
    keep = ((~del_pred) | protect) & (tokens != pad)
    # stable order: kept tokens first, original order preserved
    key = jnp.where(keep, 0, 1) * L + jnp.arange(L)[None, :]
    order = jnp.argsort(key, axis=1)
    new_tokens = jnp.take_along_axis(tokens, order, axis=1)
    new_scores = jnp.take_along_axis(scores, order, axis=1)
    n_keep = jnp.sum(keep, axis=1, keepdims=True)
    valid = jnp.arange(L)[None, :] < n_keep
    return jnp.where(valid, new_tokens, pad), jnp.where(valid, new_scores, 0.0)


def apply_ins_masks(tokens: jnp.ndarray, scores: jnp.ndarray,
                    ins_pred: jnp.ndarray, pad: int, unk: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Insert ins_pred[j] <unk> after token j (j = 0..L-2), fixed buffer.

    Insertions whose result would exceed L are clamped off (the reference
    pre-clamps with max_lens; here the buffer is the hard bound)."""
    B, L = tokens.shape
    lengths = jnp.sum(tokens != pad, axis=1)  # incl bos/eos
    slot_valid = jnp.arange(L - 1)[None, :] < (lengths[:, None] - 1)
    ins = jnp.where(slot_valid, ins_pred, 0)
    # clamp so total stays within the buffer
    total_allowed = L - lengths
    cum = jnp.cumsum(ins, axis=1)
    overflow = jnp.maximum(cum - total_allowed[:, None], 0)
    prev_overflow = jnp.concatenate([jnp.zeros((B, 1), overflow.dtype),
                                     overflow[:, :-1]], axis=1)
    ins = jnp.maximum(ins - (overflow - prev_overflow), 0)
    cum = jnp.cumsum(ins, axis=1)

    # position of original token j in the new sequence
    shift = jnp.concatenate([jnp.zeros((B, 1), cum.dtype), cum], axis=1)  # [B, L]
    new_pos = jnp.arange(L)[None, :] + shift
    tok_valid = jnp.arange(L)[None, :] < lengths[:, None]
    new_pos = jnp.where(tok_valid, new_pos, L)  # out-of-range → dropped
    new_pos = jnp.clip(new_pos, 0, L)  # scatter with drop mode

    new_len = lengths + cum[:, -1]
    base_valid = jnp.arange(L)[None, :] < new_len[:, None]
    new_tokens = jnp.where(base_valid, unk, pad).astype(tokens.dtype)
    new_scores = jnp.zeros_like(scores)

    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, L))
    new_tokens = new_tokens.at[b_idx, new_pos].set(
        jnp.where(tok_valid, tokens, pad), mode="drop")
    new_scores = new_scores.at[b_idx, new_pos].set(
        jnp.where(tok_valid, scores, 0.0), mode="drop")
    return new_tokens, new_scores


def apply_ins_words(tokens: jnp.ndarray, scores: jnp.ndarray,
                    word_pred: jnp.ndarray, word_score: jnp.ndarray, unk: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fill <unk> placeholders with predicted words."""
    is_unk = tokens == unk
    return (jnp.where(is_unk, word_pred, tokens),
            jnp.where(is_unk, word_score, scores))


def random_delete(rng: np.random.Generator, tokens: np.ndarray,
                  pad: int, bos: int, eos: int,
                  intact_prob: float = 0.0) -> np.ndarray:
    """Training noise (reference models.py:63 `_random_delete`): drop a
    uniform fraction of the inner tokens, keep bos/eos, left-compact.

    `intact_prob`: probability a sequence is passed through UNCHANGED.
    The reference roll-in (and this one at the default 0.0) keeps at most
    len-1 inner tokens — floor(len·U[0,1)) < len — so the mask-ins head
    never trains on a "nothing to insert" example; at large data scale
    the head generalizes to zero insertions anyway, but small-corpus
    runs (overfit proofs, tiny fine-tunes) need the identity roll-in
    mixed in or the refine loop inserts junk into already-correct
    predictions."""
    B, L = tokens.shape
    out = np.full_like(tokens, pad)
    for b in range(B):
        toks = [t for t in tokens[b].tolist() if t != pad]
        inner = toks[1:-1]
        if intact_prob > 0.0 and rng.uniform() < intact_prob:
            kept = toks
        else:
            keep_frac = rng.uniform()
            scores = rng.uniform(size=len(inner))
            n_keep = int(np.floor(len(inner) * keep_frac))
            keep_idx = np.sort(np.argsort(scores)[:n_keep])
            kept = [toks[0]] + [inner[i] for i in keep_idx] + [toks[-1]]
        out[b, : len(kept)] = kept
    return out

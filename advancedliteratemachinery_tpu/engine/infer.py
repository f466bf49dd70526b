"""Batched inference engine.

One jitted graph per (model, batch-shape): on-device preprocessing → forward
→ greedy decode + confidence, so the host only moves uint8 crops in and tiny
id/score tensors out. This replaces the reference's per-image python eval
loops (MGP-STR test_final.py:114 validation; LISTER test.py:23).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
from advancedliteratemachinery_tpu.ops.image import normalize_crops


# per-head EOS token ids (reference utils.py TokenLabelConverter: char [s]=1,
# GPT-2 BPE eos=2 in the MGP-STR layout, BERT [SEP]=102)
EOS_IDS = {"char": 1, "bpe": 2, "wp": 102}


class MGPSTRInference:
    """Greedy multi-granularity inference for MGP-STR.

    Device-side: forward, per-head argmax + cumulative-confidence
    (test_final.py:176-200). Host-side: id→string decode + fused selection
    (the string comparison part of fusion is inherently host work).
    """

    def __init__(self, model, params, codec: CharCodec,
                 bpe_codec=None, wp_codec=None, input_dtype=jnp.bfloat16,
                 fused_decode: str = "auto"):
        import dataclasses as _dc

        from advancedliteratemachinery_tpu.ops.vocab_decode import (
            matmul_greedy_decode, supports_fused_decode)

        # inference policy: keep logits in the compute dtype — the decode
        # reductions upcast to fp32 themselves, and a [B, 27, 50304] fp32
        # logits buffer would double HBM traffic for nothing. Also enable
        # the unsafe-softmax fast path in fused attention (inference only).
        pol = _dc.replace(model.policy,
                          output_dtype=model.policy.compute_dtype,
                          unsafe_softmax=True)
        if pol != model.policy:
            model = type(model)(model.config, policy=pol)
        self.model = model
        # pre-cast params to the compute dtype once: halves weight HBM
        # traffic per call (the 768x50304 BPE head alone is 154MB in fp32)
        self.params = model.policy.cast_to_compute(params)
        self.codec = codec
        self.bpe_codec = bpe_codec
        self.wp_codec = wp_codec
        self.input_dtype = input_dtype
        cfg = model.config
        true_vocab = {"char": cfg.num_char_classes, "bpe": cfg.bpe_vocab_size,
                      "wp": cfg.wp_vocab_size}
        heads = tuple(cfg.heads)

        def _use_fused(head: str) -> bool:
            """Fuse the vocab matmul + greedy decode (ops/vocab_decode.py)
            for the large-vocab heads: the [B, T, 50k] logits tensor never
            touches HBM. Small char vocab stays on the XLA path."""
            if fused_decode == "never":
                return False
            pv = cfg.padded_vocab(true_vocab[head])
            if fused_decode == "interpret":   # CPU test hook
                return pv >= 1024
            return supports_fused_decode(cfg.vit_config().embed_dim, pv)

        interp = fused_decode == "interpret"
        fused_heads = tuple(h for h in heads if _use_fused(h))
        self._fused_heads = fused_heads

        def _decode_all(params, x):
            """Normalized images → per-head (ids, conf). Shared by the
            batched engine and the e2e spotting pipeline."""
            out = model.apply({"params": params}, x, deterministic=True,
                              decode_tokens=bool(fused_heads))
            res = {}
            for head in heads:
                if head in fused_heads:
                    tok = out[head][:, 1:, :]             # drop [GO] position
                    B, T, D = tok.shape
                    hp = params[f"{head}_head"]
                    ids, pmax = matmul_greedy_decode(
                        tok.reshape(B * T, D), hp["kernel"], hp["bias"],
                        true_vocab[head], interpret=interp)
                    ids = ids.reshape(B, T)
                    pmax = pmax.reshape(B, T)
                    conf = self._conf_from_pmax(ids, pmax, EOS_IDS[head])
                elif bool(fused_heads):
                    # model returned tokens; apply the small head inline
                    tok = out[head]
                    hp = params[f"{head}_head"]
                    logits = (tok @ hp["kernel"].astype(tok.dtype)
                              + hp["bias"].astype(tok.dtype))
                    ids, conf = self._head_decode(logits, head, true_vocab[head])
                else:
                    ids, conf = self._head_decode(out[head], head,
                                                  true_vocab[head])
                res[f"{head}_ids"] = ids
                res[f"{head}_conf"] = conf
            return res

        self._decode_all = _decode_all

        @jax.jit
        def _run(params, images_u8):
            x = normalize_crops(images_u8, dtype=input_dtype)
            return _decode_all(params, x)

        self._run = _run

    @staticmethod
    def _head_decode(logits: jnp.ndarray, head: str, true_vocab: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Greedy ids (positions 1:) + cumulative max-prob confidence up to the
        head's EOS id (char: 1, bpe: 2, wp: 102). Vocab-padding columns
        (>= true_vocab) are masked out.

        Implemented as max/argmax/logsumexp reductions over the logits —
        never materializing the [B, T, 50k] probability tensor the
        reference's softmax+max does (test_final.py:150-152)."""
        if logits.shape[-1] > true_vocab:
            pad_mask = jnp.arange(logits.shape[-1]) >= true_vocab
            logits = jnp.where(pad_mask, -jnp.inf, logits)
        logits = logits[:, 1:, :]
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lmax = jnp.max(logits.astype(jnp.float32), axis=-1)
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        pmax = jnp.exp(lmax - lse)
        conf = MGPSTRInference._conf_from_pmax(pred, pmax, EOS_IDS[head])
        return pred, conf

    @staticmethod
    def _conf_from_pmax(pred: jnp.ndarray, pmax: jnp.ndarray, eos_id: int
                        ) -> jnp.ndarray:
        """Cumulative max-prob confidence up to the first EOS; 0 when the
        sequence never emits EOS (test_final.py:176-200 semantics)."""
        is_eos = pred == eos_id
        any_eos = jnp.any(is_eos, axis=1)
        eos_pos = jnp.argmax(is_eos, axis=1)
        pos = jnp.arange(pred.shape[1])[None, :]
        conf = jnp.prod(jnp.where(pos <= eos_pos[:, None], pmax, 1.0), axis=1)
        return jnp.where(any_eos, conf, 0.0)

    def __call__(self, images_u8: np.ndarray) -> Dict[str, np.ndarray]:
        """images_u8: [B, 32, 128, 3] uint8 → dict of np arrays."""
        out = self._run(self.params, jnp.asarray(images_u8))
        return {k: np.asarray(v) for k, v in out.items()}

    def recognize(self, images_u8: np.ndarray):
        """Full fused recognition → list of (text, confidence, head)."""
        out = self(images_u8)
        char_strs = self.codec.decode(out["char_ids"])
        results = []
        B = len(char_strs)
        bpe_strs = (self.bpe_codec.decode(out["bpe_ids"]) if self.bpe_codec
                    else [None] * B)
        wp_strs = [None] * B
        if self.wp_codec:
            raw = self.wp_codec.decode(out["wp_ids"])
            wp_strs = [s.split("[SEP]")[0] for s in raw]
        for i in range(B):
            cands = [(char_strs[i].split("[s]")[0], float(out["char_conf"][i]), "char")]
            if bpe_strs[i] is not None:
                cands.append((bpe_strs[i], float(out["bpe_conf"][i]), "bpe"))
            if wp_strs[i] is not None:
                cands.append((wp_strs[i], float(out["wp_conf"][i]), "wp"))
            results.append(max(cands, key=lambda c: c[1]))
        return results


class LISTERInference:
    """Batched LISTER recognition: device-side normalize → FocalNet +
    neighbor decode → greedy ids + cumulative confidence; host-side
    EosSeqCodec string decode (reference test.py:23 evaluate loop)."""

    def __init__(self, model, params, codec=None, input_dtype=jnp.bfloat16):
        from advancedliteratemachinery_tpu.codecs.seq_codec import EosSeqCodec

        self.model = model
        self.params = model.policy.cast_to_compute(params)
        self.codec = codec or EosSeqCodec()
        self.input_dtype = input_dtype

        @jax.jit
        def _run(params, images_u8):
            x = normalize_crops(images_u8, dtype=input_dtype)
            mask = jnp.ones(x.shape[:3], x.dtype)
            res = model.apply({"params": params}, x, mask)
            logits = res[-1]["logits"].astype(jnp.float32)   # [B, L, nC]
            ids = jnp.argmax(logits, -1).astype(jnp.int32)
            pmax = jnp.max(jax.nn.softmax(logits, -1), -1)
            is_eos = ids == 0
            any_eos = jnp.any(is_eos, axis=1)
            eos_pos = jnp.argmax(is_eos, axis=1)
            pos = jnp.arange(ids.shape[1])[None]
            conf = jnp.prod(jnp.where(pos <= eos_pos[:, None], pmax, 1.0),
                            axis=1)
            return ids, jnp.where(any_eos, conf, 0.0)

        self._run = _run

    def recognize(self, images_u8: np.ndarray):
        ids, conf = self._run(self.params, jnp.asarray(images_u8))
        texts = self.codec.decode(np.asarray(ids))
        return [(t, float(c), "lister") for t, c in zip(texts,
                                                        np.asarray(conf))]


class LevOCRInference:
    """Batched LevOCR: vision prediction + Levenshtein refinement rounds →
    token strings via the fairseq-style dictionary (reference eval.py:139
    generate loop)."""

    def __init__(self, model, params, dictionary=None,
                 input_dtype=jnp.float32):
        from advancedliteratemachinery_tpu.models.levocr import LevtDictionary

        self.model = model
        self.params = params
        self.dictionary = dictionary or LevtDictionary(
            max_len=model.config.max_len)
        self.input_dtype = input_dtype

        @jax.jit
        def _run(variables, images_u8):
            x = normalize_crops(images_u8, dtype=input_dtype)
            out = model.apply(variables, x, method=model.refine)
            return out["tokens"], out["scores"]

        self._run = _run

    def recognize(self, images_u8: np.ndarray, variables=None):
        v = variables if variables is not None else self.params
        tokens, scores = self._run(v, jnp.asarray(images_u8))
        texts = self.dictionary.decode(np.asarray(tokens))
        s = np.asarray(scores, np.float64)
        conf = np.exp(np.where(np.isfinite(s), s, 0.0).mean(axis=-1))
        return [(t, float(c), "levocr") for t, c in zip(texts, conf)]

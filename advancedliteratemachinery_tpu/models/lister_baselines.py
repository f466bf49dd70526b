"""LISTER baseline decoders: CTC, RNN attention, parallel attention.

Behavioral parity targets (reference OCR/LISTER/model/):
- CTCDecoder (ctc_decoder.py:5): per-position linear over the flattened
  feature map → CTC logits.
- ParallelAttention PAT (pat_decoder.py:6): key projection → 26 learned
  order queries → masked softmax over positions → per-slot classifier.
- RNNAttention (RNNDecoder.py:10): GRU cell with Bahdanau-style attention
  over the masked feature sequence (fixed-step scan on TPU; teacher forcing
  at train time, greedy feedback at eval).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY


class CTCDecoder(nn.Module):
    num_classes: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask) -> Dict[str, jnp.ndarray]:
        """x [B,h,w,C]; mask [B,h,w] → logits [B, h*w, nC] (blank id 0)."""
        B, h, w, C = x.shape
        xf = x.reshape(B, h * w, C)
        logits = nn.Dense(self.num_classes, dtype=self.policy.compute_dtype,
                          param_dtype=self.policy.param_dtype,
                          name="fc")(xf).astype(jnp.float32)
        return {"logits": logits, "mask": mask.reshape(B, h * w)}


class ParallelAttention(nn.Module):
    num_classes: int
    max_ch: int = 26
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask) -> Dict[str, jnp.ndarray]:
        p = self.policy
        B, h, w, C = x.shape
        xf = x.reshape(B, h * w, C)
        mf = mask.reshape(B, h * w)
        key = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       name="k_map")(xf)
        att = nn.Dense(self.max_ch, dtype=p.compute_dtype,
                       param_dtype=p.param_dtype, name="order_att")(key)
        att = att.swapaxes(1, 2)                       # [B, T, N]
        att = jnp.where(mf[:, None, :] > 0, att.astype(jnp.float32), -1e30)
        att = jax.nn.softmax(att, axis=2)
        char_feat = jnp.einsum("btn,bnc->btc", att.astype(xf.dtype), xf)
        logits = nn.Dense(self.num_classes, dtype=p.compute_dtype,
                          param_dtype=p.param_dtype,
                          name="fc")(char_feat).astype(jnp.float32)
        return {"logits": logits, "char_maps": att, "h": h}


class RNNAttention(nn.Module):
    """GRU + additive attention (RNNDecoder.py:10/:87), fixed num_steps."""

    num_classes: int
    hidden_size: int = 256
    num_steps: int = 26
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask, targets: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        """x [B,h,w,C]; targets [B,T] for teacher forcing (train)."""
        p = self.policy
        B, h, w, C = x.shape
        H = self.hidden_size
        feats = x.reshape(B, h * w, C).astype(jnp.float32)
        mf = mask.reshape(B, h * w).astype(jnp.float32)

        i2h = nn.Dense(H, use_bias=False, name="i2h")
        h2h = nn.Dense(H, name="h2h")
        score = nn.Dense(1, use_bias=False, name="score")
        gru = nn.GRUCell(features=H, name="gru")
        cls = nn.Dense(self.num_classes, name="generator")
        feats_proj = i2h(feats)                          # precompute [B,N,H]

        def step(carry, t):
            hidden, prev_tok = carry
            e = score(jnp.tanh(feats_proj + h2h(hidden)[:, None]))[..., 0]
            e = jnp.where(mf > 0, e, -1e30)
            alpha = jax.nn.softmax(e, axis=1)
            ctx = jnp.einsum("bn,bnc->bc", alpha, feats)
            onehot = jax.nn.one_hot(prev_tok, self.num_classes)
            inp = jnp.concatenate([ctx, onehot], axis=-1)
            new_hidden, _ = gru(hidden, inp)
            logits_t = cls(new_hidden)
            if targets is not None:
                nxt = targets[:, t]
            else:
                nxt = jnp.argmax(logits_t, -1)
            return (new_hidden, nxt), logits_t

        hidden0 = jnp.zeros((B, H))
        tok0 = jnp.zeros((B,), jnp.int32)
        # unrolled (module calls inside lax.scan need nn.scan lifting)
        logits = []
        carry = (hidden0, tok0)
        for t in range(self.num_steps):
            carry, lt = step(carry, t)
            logits.append(lt)
        return {"logits": jnp.stack(logits, axis=1).astype(jnp.float32)}


def ctc_greedy_loss(logits: jnp.ndarray, logit_mask: jnp.ndarray,
                    labels: jnp.ndarray, label_lens: jnp.ndarray
                    ) -> jnp.ndarray:
    """CTC loss via optax (blank 0), masked inputs (train_dist.py ctc path)."""
    import optax

    logit_paddings = 1.0 - logit_mask.astype(jnp.float32)
    T = labels.shape[1]
    pos = jnp.arange(T)[None, :]
    label_paddings = (pos >= label_lens[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings)
    return jnp.mean(per_seq)

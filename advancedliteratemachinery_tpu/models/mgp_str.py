"""MGP-STR: Multi-Granularity Prediction scene-text recognizer (TPU-native).

Behavioral parity target (reference: OCR/MGP-STR):
- ViT backbone on 32x128 crops, patch 4 → 257 tokens incl. cls
  (modules/mgp_str.py:64 forward_features; no final encoder norm).
- Three A³ TokenLearner aggregation heads (modules/token_learner.py:11):
  LayerNorm → grouped 1x1 conv (groups=8) → 1x1 conv to T=batch_max_length
  → softmax over the 257 spatial tokens → weighted sum of a grouped-conv
  feature projection → LayerNorm. Output [B, T, D].
- Three classification heads: char (num_class), BPE (50257 = GPT-2 vocab),
  wordpiece (30522 = BERT vocab) (modules/mgp_str.py:58-61).

TPU-first notes: the grouped 1x1 convs are block-diagonal matmuls
(einsum over a [G, D/G, D/G] kernel — dense MXU work, no conv windowing);
the token selection is one [B,T,S]x[B,S,D] batched matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.vit import VisionTransformer, ViTConfig, VIT_VARIANTS

GPT2_VOCAB_SIZE = 50257  # reference mgp_str.py:60
BERT_VOCAB_SIZE = 30522  # reference mgp_str.py:61


class GroupedPointwise(nn.Module):
    """Grouped 1x1 conv over channels of [B, S, D] as block-diagonal einsum."""

    out_dim: int
    groups: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        G = self.groups
        if D % G or self.out_dim % G:
            raise ValueError(f"dims {D}->{self.out_dim} not divisible by groups {G}")
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (G, D // G, self.out_dim // G), self.policy.param_dtype,
        )
        xg = x.reshape(B, S, G, D // G).astype(self.policy.compute_dtype)
        out = jnp.einsum("bsgi,gio->bsgo", xg, kernel.astype(self.policy.compute_dtype))
        return out.reshape(B, S, self.out_dim)


class TokenLearner(nn.Module):
    """A³ attention-aggregation module. Returns (attn [B,T,S], tokens [B,T,D])."""

    out_tokens: int
    groups: int = 8
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype, name="token_norm")(x)
        x = x.astype(p.compute_dtype)
        # selector: grouped pointwise D→D then pointwise D→T, softmax over S
        sel = GroupedPointwise(x.shape[-1], self.groups, policy=p, name="select_group")(x)
        sel = nn.Dense(self.out_tokens, use_bias=False, dtype=p.compute_dtype,
                       param_dtype=p.param_dtype, name="select_proj")(sel)
        attn = nn.softmax(sel.astype(jnp.float32), axis=1)  # normalize over S per out-token
        # NOTE: reference softmaxes over the spatial axis of [B, T, S]; here sel is
        # [B, S, T] so axis=1 is the spatial axis.
        feat = GroupedPointwise(x.shape[-1], self.groups, policy=p, name="feat")(x)
        tokens = jnp.einsum("bst,bsd->btd", attn.astype(p.compute_dtype), feat)
        tokens = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype, name="norm")(tokens)
        return attn.swapaxes(1, 2), tokens.astype(p.compute_dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class MGPSTRConfig(ConfigBase):
    variant: str = "base"
    batch_max_length: int = 25  # chars; +2 specials → 27 output tokens
    num_char_classes: int = 38  # [GO] + [s] + 36 lowercase alnum
    bpe_vocab_size: int = GPT2_VOCAB_SIZE
    wp_vocab_size: int = BERT_VOCAB_SIZE
    # Head output dims are padded up to a multiple of this: MXU tiles are
    # 128-wide, and tensor-parallel sharding needs divisible vocab dims
    # (GPT-2's 50257 is odd). Padded logits are masked at decode; padded ids
    # never appear as targets so the loss is unaffected.
    vocab_pad_multiple: int = 128
    drop_path: float = 0.0
    # explicit backbone override (None → the named variant)
    vit: "ViTConfig" = None
    # which granularity heads to build: ("char",) gives the reference's
    # char-str variant (models.py:31 Transformer == "char-str")
    heads: tuple = ("char", "bpe", "wp")

    @property
    def max_tokens(self) -> int:
        return self.batch_max_length + 2

    def padded_vocab(self, true_size: int) -> int:
        return _round_up(true_size, self.vocab_pad_multiple)

    def vit_config(self) -> ViTConfig:
        if self.vit is not None:
            return self.vit
        return VIT_VARIANTS[self.variant].replace(drop_path=self.drop_path)


@MODELS.register("mgp_str")
class MGPSTR(nn.Module):
    config: MGPSTRConfig = MGPSTRConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, deterministic: bool = True, return_attn: bool = False,
                 decode_tokens: bool = False) -> Dict[str, jnp.ndarray]:
        """images: [B, 32, 128, 3] normalized to [-1, 1].

        Returns dict of logits: char [B,T,C], bpe [B,T,~50257], wp
        [B,T,~30522] (float32, vocab dims padded per `vocab_pad_multiple`
        with -inf-equivalent masking applied downstream), plus attention
        maps if return_attn.

        decode_tokens=True returns the post-TokenLearner tokens [B, T, D]
        per head instead of logits (the head Dense is skipped) — the
        inference engine then fuses the vocab matmul with greedy decode
        (ops/vocab_decode.py) so the [B, T, 50k] logits never hit HBM.
        """
        cfg = self.config
        p = self.policy
        feats = VisionTransformer(cfg.vit_config(), policy=p, name="encoder")(
            images, deterministic=deterministic
        )

        out: Dict[str, jnp.ndarray] = {}
        all_heads = {
            "char": cfg.num_char_classes,
            "bpe": cfg.padded_vocab(cfg.bpe_vocab_size),
            "wp": cfg.padded_vocab(cfg.wp_vocab_size),
        }
        heads = [(n, all_heads[n]) for n in cfg.heads]
        for name, vocab in heads:
            attn, tokens = TokenLearner(cfg.max_tokens, policy=p,
                                        name=f"{name}_token_learner")(feats)
            if decode_tokens and not self.is_initializing():
                out[name] = tokens
            else:
                logits = nn.Dense(vocab, dtype=p.compute_dtype,
                                  param_dtype=p.param_dtype,
                                  name=f"{name}_head")(tokens)
                out[name] = logits.astype(p.output_dtype)
            if return_attn:
                out[f"{name}_attn"] = attn
        return out

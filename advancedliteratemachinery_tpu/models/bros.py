"""BROS-style text-layout encoder with continuous relative 2D positions.

Behavioral parity target: GeoLayoutLM's vendored BROS
(reference DocumentUnderstanding/GeoLayoutLM/bros/modeling_bros.py —
PositionalEmbedding1D :65 [TransformerXL sin/cos], PositionalEmbedding2D
:97 [per-bbox-dim x/y sinusoids concatenated], BrosEmbeddings :122
[word + abs pos + token type + LayoutLM-style line-bbox lookups + line-rank
embeddings], calc_bbox_pos_emb :278 with pe_type="crel" [pairwise bbox
differences → sinusoid → projection to d_head], BrosSelfAttention :296
[scores += einsum("bnid,bijd->bnij", q, rel_pos)]).

TPU note: the crel pairwise tensor is [S, S, d_head] per sample — computed
once per forward and shared by all layers, exactly like the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import gelu as _gelu, Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class BrosConfig(ConfigBase):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    max_2d_position_embeddings: int = 1024   # bbox int coords 0..1000
    max_block_num: int = 256                 # line-rank vocabulary
    dim_bbox: int = 8
    coordinate_size: int = 128               # x/y spatial embed dim (BROS-base)
    shape_size: int = 128                    # h/w spatial embed dim

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def sinusoid_1d(pos: jnp.ndarray, demb: int) -> jnp.ndarray:
    """TransformerXL-style: cat(sin(pos·f), cos(pos·f)), f log-spaced
    (modeling_bros.py:65)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, demb, 2) / demb))
    inp = pos[..., None] * jnp.asarray(inv_freq, pos.dtype)
    return jnp.concatenate([jnp.sin(inp), jnp.cos(inp)], axis=-1)


def sinusoid_2d(bbox: jnp.ndarray, demb: int, dim_bbox: int = 8) -> jnp.ndarray:
    """Per-bbox-dimension sinusoids, x/y alternating (modeling_bros.py:97).
    bbox [..., dim_bbox] → [..., demb]."""
    per = demb // dim_bbox
    parts = [sinusoid_1d(bbox[..., i], per) for i in range(dim_bbox)]
    return jnp.concatenate(parts, axis=-1)


class BrosSelfAttention(nn.Module):
    cfg: BrosConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, bbox_pos_emb, attn_bias):
        """x [B,S,D]; bbox_pos_emb [B,S,S,hd] (crel); attn_bias [B,1,1,S]."""
        cfg = self.cfg
        p = self.policy
        B, S, D = x.shape
        H, hd = cfg.num_attention_heads, cfg.head_dim
        q = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="query")(x).reshape(B, S, H, hd)
        k = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="key")(x).reshape(B, S, H, hd)
        v = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="value")(x).reshape(B, S, H, hd)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k)
        # crel: every head shares the projected relative-position embedding
        rel = jnp.einsum("bihd,bijd->bhij", q, bbox_pos_emb.astype(q.dtype))
        scores = (scores + rel) / (hd ** 0.5)
        scores = scores + attn_bias
        a = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", a, v).reshape(B, S, D)
        return out


class BrosLayer(nn.Module):
    cfg: BrosConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, bbox_pos_emb, attn_bias, deterministic=True):
        cfg = self.cfg
        p = self.policy
        h = BrosSelfAttention(cfg, policy=p, name="attn")(x, bbox_pos_emb, attn_bias)
        h = nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="attn_out")(h)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="attn_norm")(x + h).astype(p.compute_dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="ffn1")(x)
        h = _gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="ffn2")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                            param_dtype=p.param_dtype,
                            name="ffn_norm")(x + h).astype(p.compute_dtype)


class BrosTextEncoder(nn.Module):
    """BrosModel: embeddings + N layers + pooler (modeling_bros.py)."""

    cfg: BrosConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, input_ids, bbox_4p_normalized, attention_mask,
                 line_bbox=None, line_rank_id=None, line_rank_inner_id=None,
                 deterministic: bool = True):
        """input_ids [B,S]; bbox_4p_normalized [B,S,8] floats in [0,1];
        attention_mask [B,S]; line_bbox [B,S,4] ints 0..1000."""
        cfg = self.cfg
        p = self.policy
        B, S = input_ids.shape

        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=p.param_dtype,
                       name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       param_dtype=p.param_dtype, name="position_embeddings")(
            jnp.arange(S)[None])
        tok_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                            param_dtype=p.param_dtype, name="token_type_embeddings")(
            jnp.zeros((B, S), jnp.int32))
        emb = emb + pos + tok_type

        if line_bbox is not None:
            # LayoutLM-style absolute spatial lookups, CONCATENATED like the
            # reference (modeling_bros.py:192 — left/upper/right/lower at
            # coordinate_size + h/w at shape_size, cat == hidden_size)
            if 4 * cfg.coordinate_size + 2 * cfg.shape_size != cfg.hidden_size:
                raise ValueError(
                    "BrosConfig: 4*coordinate_size + 2*shape_size must equal "
                    f"hidden_size ({cfg.hidden_size}), got "
                    f"{4 * cfg.coordinate_size + 2 * cfg.shape_size}")
            xe = nn.Embed(cfg.max_2d_position_embeddings, cfg.coordinate_size,
                          param_dtype=p.param_dtype, name="x_position_embeddings")
            ye = nn.Embed(cfg.max_2d_position_embeddings, cfg.coordinate_size,
                          param_dtype=p.param_dtype, name="y_position_embeddings")
            he = nn.Embed(cfg.max_2d_position_embeddings, cfg.shape_size,
                          param_dtype=p.param_dtype, name="h_position_embeddings")
            we = nn.Embed(cfg.max_2d_position_embeddings, cfg.shape_size,
                          param_dtype=p.param_dtype, name="w_position_embeddings")
            lb = jnp.clip(line_bbox, 0, cfg.max_2d_position_embeddings - 1)
            spatial = jnp.concatenate([
                xe(lb[:, :, 0]), ye(lb[:, :, 1]), xe(lb[:, :, 2]),
                ye(lb[:, :, 3]),
                he(jnp.clip(lb[:, :, 3] - lb[:, :, 1], 0,
                            cfg.max_2d_position_embeddings - 1)),
                we(jnp.clip(lb[:, :, 2] - lb[:, :, 0], 0,
                            cfg.max_2d_position_embeddings - 1)),
            ], axis=-1)
            emb = emb + spatial
        if line_rank_id is not None:
            emb = emb + nn.Embed(cfg.max_block_num, cfg.hidden_size,
                                 param_dtype=p.param_dtype,
                                 name="line_rank_embeddings")(line_rank_id)
        if line_rank_inner_id is not None:
            inner = nn.Embed(4, cfg.hidden_size, param_dtype=p.param_dtype,
                             name="line_rank_inner_embeddings")
            emb = emb + inner(line_rank_inner_id)

        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="emb_norm")(emb).astype(p.compute_dtype)

        # crel relative position embedding, shared across layers
        diff = bbox_4p_normalized[:, None, :, :] - bbox_4p_normalized[:, :, None, :]
        sin_dim = cfg.hidden_size // 4
        rel = sinusoid_2d(diff.astype(jnp.float32), sin_dim, cfg.dim_bbox)
        rel = nn.Dense(cfg.head_dim, use_bias=False, dtype=p.compute_dtype,
                       param_dtype=p.param_dtype, name="bbox_projection")(
            rel.astype(p.compute_dtype))               # [B,S,S,hd]

        attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        for i in range(cfg.num_hidden_layers):
            x = BrosLayer(cfg, policy=p, name=f"layer_{i}")(
                x, rel, attn_bias, deterministic)

        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                                  param_dtype=p.param_dtype,
                                  name="pooler")(x[:, 0]))
        return x, pooled

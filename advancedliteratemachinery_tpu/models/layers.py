"""Shared transformer building blocks (TPU-first).

Design notes:
- Attention QKV is one fused projection (a single large matmul feeds the MXU
  better than three). On TPU the attention consumes that projection output
  directly via ops.attention.fused_qkv_attention — a Pallas kernel in the
  natural [B, S, 3D] layout (profiling showed the BSHD→BHSD transposes, not
  the compute, dominate any per-head kernel; the fused-qkv layout halves the
  whole sublayer: 8.86→3.96 ms at ViT-base B=256 on v5e). Masked/CPU paths
  fall back to explicit einsums, which measured 1.56x faster than
  jax.nn.dot_product_attention on v5e at OCR sequence lengths.
- All matmuls run in the policy compute dtype (bf16); layernorms accumulate
  in fp32.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.precision import gelu as _policy_gelu

Dtype = jnp.dtype


class DropPath(nn.Module):
    """Stochastic depth per sample."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    policy: Policy = DEFAULT_POLICY
    act: Callable = _policy_gelu

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.policy.compute_dtype
        x = nn.Dense(self.hidden_dim, dtype=c, param_dtype=self.policy.param_dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=c, param_dtype=self.policy.param_dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MultiHeadSelfAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        B, N, D = x.shape
        H = self.num_heads
        head_dim = D // H
        c = self.policy.compute_dtype

        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=c,
                       param_dtype=self.policy.param_dtype, name="qkv")(x)
        # timm qkv weight layout (q rows | k rows | v rows) — exactly the
        # [B, N, 3D] concatenation fused_qkv_attention consumes.
        from advancedliteratemachinery_tpu.ops.attention import (
            fused_qkv_attention, supports_fused_qkv)

        if mask is None and supports_fused_qkv(B, N, D, H):
            out = fused_qkv_attention(
                qkv, H, safe=not self.policy.unsafe_softmax)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, H, head_dim)
            k = k.reshape(B, N, H, head_dim)
            v = v.reshape(B, N, H, head_dim)
            # explicit einsum attention: measured 1.56x faster than
            # jax.nn.dot_product_attention on v5e at short OCR sequences.
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5)
            if mask is not None:
                s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
            a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", a, v)
            out = out.reshape(B, N, D)
        out = nn.Dense(D, dtype=c, param_dtype=self.policy.param_dtype, name="proj")(out)
        out = nn.Dropout(self.proj_dropout)(out, deterministic=deterministic)
        return out


class EncoderBlock(nn.Module):
    """Pre-LN transformer encoder block (ViT style)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path: float = 0.0
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        p = self.policy
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype, name="norm1")(x)
        h = MultiHeadSelfAttention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_dropout,
            self.dropout, policy=p, name="attn",
        )(h.astype(p.compute_dtype), mask=mask, deterministic=deterministic)
        h = DropPath(self.drop_path, name="drop_path1")(h, deterministic=deterministic)
        x = x + h

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dropout,
                policy=p, name="mlp")(h.astype(p.compute_dtype), deterministic=deterministic)
        h = DropPath(self.drop_path, name="drop_path2")(h, deterministic=deterministic)
        return x + h


class PatchEmbed(nn.Module):
    """Image → patch tokens via strided conv (one MXU-friendly matmul)."""

    patch_size: int
    embed_dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] (NHWC — TPU-native layout)
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, kernel_size=(p, p), strides=(p, p), padding="VALID",
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="proj",
        )(x)
        B, Hp, Wp, D = x.shape
        return x.reshape(B, Hp * Wp, D)

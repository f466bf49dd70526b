"""ABINet vision model (ResNet45 + transformer + position attention).

Behavioral parity target: LevOCR's vendored ABINet vision branch
(reference OCR/LevOCR/abinet/: resnet.py:103 resnet45 [BasicBlock,
layers 3,4,6,6,3, strides 2,1,2,1,1 → 32x128 input → 8x32x512 map],
backbone.py:13 ResTranformer [3 post-norm encoder layers, d 512, heads 8,
ffn 2048, sincos positions], model_vision.py:23 PositionAttention
[U-Net key encoder (strides (1,2),(2,2),(2,2),(2,2)) + mirrored decoder,
learned-position queries → T=max_length attention readout],
model_vision.py:77 BaseVision).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY

BN_MOMENTUM = 0.9


def sincos_positions(length: int, dim: int) -> np.ndarray:
    """Classic transformer sin/cos table [length, dim]."""
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    relu: bool = True
    use_bias: bool = False
    padding: Optional[Tuple[Tuple[int, int], ...]] = None
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        # torch-style symmetric (k-1)//2 padding (flax SAME is asymmetric at
        # stride>1, shifting the grid vs torch checkpoints — see MaskedConv)
        pad = self.padding if self.padding is not None else \
            tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel)
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    use_bias=self.use_bias, dtype=p.compute_dtype,
                    param_dtype=p.param_dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32, param_dtype=p.param_dtype, name="bn")(x)
        x = x.astype(p.compute_dtype)
        return nn.relu(x) if self.relu else x


class ResBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.planes, (1, 1), policy=self.policy, name="conv1")(x, train)
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride), relu=False,
                     policy=self.policy, name="conv2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = ConvBN(self.planes, (1, 1), (self.stride, self.stride),
                              relu=False, policy=self.policy,
                              name="downsample")(x, train)
        return nn.relu(out + residual)


class ResNet45(nn.Module):
    """resnet.py:50 — stem conv + 5 stages [3,4,6,6,3], planes
    32/64/128/256/512 (out_dim=512), strides 2/1/2/1/1. `out_dim` scales
    all widths proportionally (512 = reference)."""

    out_dim: int = 512
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        w = self.out_dim // 16
        x = ConvBN(w, (3, 3), policy=p, name="stem")(x.astype(p.compute_dtype), train)
        for s, (planes, blocks, stride) in enumerate(
                [(w, 3, 2), (2 * w, 4, 1), (4 * w, 6, 2), (8 * w, 6, 1),
                 (16 * w, 3, 1)]):
            for b in range(blocks):
                x = ResBasicBlock(planes, stride if b == 0 else 1, policy=p,
                                  name=f"layer{s}_block{b}")(x, train)
        return x  # [B, H/4, W/4, out_dim]


class ABINetEncoderLayer(nn.Module):
    """Post-norm torch nn.TransformerEncoderLayer semantics."""

    dim: int = 512
    heads: int = 8
    ffn: int = 2048
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        B, T, C = x.shape
        hd = C // self.heads
        qkv = nn.Dense(3 * C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, self.heads, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        out = jax.nn.dot_product_attention(q, k, v).reshape(B, T, C)
        out = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       name="proj")(out)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm1")(x + out).astype(p.compute_dtype)
        h = nn.Dense(self.ffn, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff1")(x)
        h = nn.relu(h)
        h = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff2")(h)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                            name="norm2")(x + h).astype(p.compute_dtype)


class PositionAttention(nn.Module):
    """model_vision.py:23 — U-Net key refinement + learned-position query
    readout of T character vectors."""

    max_length: int
    in_channels: int = 512
    num_channels: int = 64
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        B, H, W, E = x.shape
        k = x
        feats = []
        for i, s in enumerate([(1, 2), (2, 2), (2, 2), (2, 2)]):
            k = ConvBN(self.num_channels, (3, 3), s, policy=p,
                       name=f"k_enc{i}")(k, train)
            feats.append(k)
        for i in range(3):
            tgt = feats[2 - i]
            k = jax.image.resize(k, tgt.shape, method="nearest")
            k = ConvBN(self.num_channels, (3, 3), policy=p,
                       name=f"k_dec{i}")(k, train)
            k = k + tgt
        k = jax.image.resize(k, (B, H, W, self.num_channels), method="nearest")
        k = ConvBN(self.in_channels, (3, 3), policy=p, name="k_dec3")(k, train)

        q = jnp.asarray(sincos_positions(self.max_length, E))[None]
        q = nn.Dense(E, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="project")(q.astype(p.compute_dtype))
        q = jnp.broadcast_to(q, (B, self.max_length, E))

        scores = jnp.einsum("bte,bhwe->bthw", q, k).reshape(B, self.max_length, H * W)
        scores = scores / (E ** 0.5)
        attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
        v = x.reshape(B, H * W, E)
        vecs = jnp.einsum("btn,bne->bte", attn, v)
        return vecs, attn.reshape(B, self.max_length, H, W)


@dataclasses.dataclass(frozen=True)
class ABINetVisionConfig(ConfigBase):
    max_length: int = 26          # batch_max_length (25) + 1 end token
    num_classes: int = 37         # charset36 + null
    d_model: int = 512
    backbone_layers: int = 3
    ffn: int = 2048               # d_inner (backbone.py:10)


class ABINetVision(nn.Module):
    """BaseVision (model_vision.py:77): ResNet45 → 3 transformer layers →
    position attention → linear cls."""

    config: ABINetVisionConfig = ABINetVisionConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        p = self.policy
        x = ResNet45(cfg.d_model, policy=p, name="resnet")(images, train)
        B, H, W, C = x.shape
        seq = x.reshape(B, H * W, C)
        pe = jnp.asarray(sincos_positions(H * W, C))[None]
        seq = seq + pe.astype(seq.dtype)
        for i in range(cfg.backbone_layers):
            seq = ABINetEncoderLayer(cfg.d_model, ffn=cfg.ffn, policy=p,
                                     name=f"tfm{i}")(seq)
        fmap = seq.reshape(B, H, W, C)
        vecs, attn = PositionAttention(cfg.max_length, cfg.d_model, policy=p,
                                       name="attention")(fmap, train)
        logits = nn.Dense(cfg.num_classes, dtype=p.compute_dtype,
                          param_dtype=p.param_dtype, name="cls")(vecs)
        return {"feature": vecs, "logits": logits.astype(jnp.float32),
                "features": fmap, "attn_scores": attn}

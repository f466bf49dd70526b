"""Swin Transformer backbone (windowed attention), NHWC, mask-aware.

Behavioral parity target: OmniParser's Swin-B
(reference: OCR/OmniParser/model/backbone/swin_transformer.py, built as
swin_base at backbone/__init__.py:19 — embed 128, depths (2,2,18,2), heads
(4,8,16,32), window 7; returns the 4 stage feature maps for the FPN).

TPU-first notes: window partition is a reshape/transpose (free under XLA);
each window's attention is a dense [nW·B, 49, C] batched matmul on the MXU.
Image padding masks ride along like DETR's NestedTensor masks (joiner.py)
so variable image sizes batch into fixed buckets.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.models.layers import DropPath


def _gelu(x):
    """Dtype-aware GELU (exact in fp32 for parity, tanh in bf16 for speed —
    see core.precision.gelu)."""
    from advancedliteratemachinery_tpu.core.precision import gelu
    return gelu(x)



def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] → [B*nH*nW, w*w, C] (H, W divisible by w)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def window_reverse(windows: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    B = windows.shape[0] // ((H // w) * (W // w))
    x = windows.reshape(B, H // w, W // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(w: int) -> np.ndarray:
    """Standard Swin relative-position index table for a w x w window."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # [w*w, w*w]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: [nW*B, N, C]; attn_mask: [nW, N, N] additive or None."""
        p = self.policy
        Bn, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        rpt = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, H), p.param_dtype)
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = rpt[idx.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        attn = attn + bias[None].astype(attn.dtype)
        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, H, N, N) + \
                attn_mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bn, H, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, N, C)
        return nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                        name="proj")(out)


def shift_attn_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Additive mask separating the 9 shifted regions (classic Swin).
    Pure numpy — H/W/w/shift are static, and this must stay a compile-time
    constant under jit."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.policy
        B, H, W, C = x.shape
        w = self.window_size
        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        Hp, Wp = H + pad_b, W + pad_r

        shortcut = x
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm1")(x).astype(p.compute_dtype)
        h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        shift = self.shift if min(Hp, Wp) > w else 0
        if shift > 0:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            amask = jnp.asarray(shift_attn_mask(Hp, Wp, w, shift))
        else:
            amask = None
        wins = window_partition(h, w)
        wins = WindowAttention(self.dim, self.num_heads, w, policy=p,
                               name="attn")(wins, amask)
        h = window_reverse(wins, w, Hp, Wp)
        if shift > 0:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        h = h[:, :H, :W]
        x = shortcut + DropPath(self.drop_path, name="dp1")(h, deterministic)

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm2")(x).astype(p.compute_dtype)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="mlp_fc1")(h)
        h = _gelu(h)
        h = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="mlp_fc2")(h)
        return x + DropPath(self.drop_path, name="dp2")(h, deterministic)


class PatchMerging(nn.Module):
    dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        B, H, W, C = x.shape
        pad_b, pad_r = H % 2, W % 2
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm")(x).astype(p.compute_dtype)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name="reduction")(x)


@dataclasses.dataclass(frozen=True)
class SwinConfig(ConfigBase):
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 128                      # base
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i) for i in range(len(self.depths)))


SWIN_VARIANTS = {
    "tiny": SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "base": SwinConfig(),
}


class SwinTransformer(nn.Module):
    """Returns the list of 4 stage feature maps (NHWC) + per-stage masks."""

    config: SwinConfig = SwinConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        cfg = self.config
        p = self.policy
        B, H, W, _ = x.shape
        if mask is None:
            mask = jnp.ones((B, H, W), jnp.float32)

        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    (cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=p.compute_dtype, param_dtype=p.param_dtype,
                    name="patch_embed")(x.astype(p.compute_dtype))
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="patch_norm")(x).astype(p.compute_dtype)

        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))
        feats, masks = [], []
        di = 0
        for s, depth in enumerate(cfg.depths):
            dim = cfg.stage_dims[s]
            for b in range(depth):
                x = SwinBlock(dim, cfg.num_heads[s], cfg.window_size,
                              shift=0 if b % 2 == 0 else cfg.window_size // 2,
                              mlp_ratio=cfg.mlp_ratio, drop_path=float(dpr[di]),
                              policy=p, name=f"stage{s}_block{b}")(x, deterministic)
                di += 1
            # per-stage output norm (OmniParser swin_transformer.py:547-550)
            xo = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                              name=f"out_norm{s}")(x).astype(p.compute_dtype)
            # stage output mask at current resolution
            sh, sw = x.shape[1], x.shape[2]
            m = jax.image.resize(mask, (B, sh, sw), method="nearest")
            feats.append(xo * m[..., None].astype(xo.dtype))
            masks.append(m)
            if s < len(cfg.depths) - 1:
                x = PatchMerging(dim, policy=p, name=f"merge{s}")(x)
        return feats, masks

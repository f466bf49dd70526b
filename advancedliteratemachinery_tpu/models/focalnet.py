"""FocalNet encoder for variable-width text images, with masking.

Behavioral parity target: LISTER's masked FocalNet-lrf
(reference: OCR/LISTER/model/feature_extractor.py — MaskedConv2d :26,
FocalModulation :62, FocalNetBlock :142, Stem :307, DownsamplingLayer :345,
FocalNet :388; variants focalnet_tiny_lrf :519 [E=64, depths 2,2,6,2] and
focalnet_base_lrf :539 [E=96, depths 2,2,9,2], focal_levels 3, layerscale).

TPU-first notes: NHWC layout throughout; variable image widths are handled
with width-padding masks carried through every conv (multiplicative
masking + max-pool mask downsampling), so one compiled graph serves a
whole width bucket. Depthwise focal convs are cheap VPU work; all
projections are dense MXU matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.models.layers import DropPath


def _gelu(x):
    """Dtype-aware GELU (exact in fp32 for parity, tanh in bf16 for speed —
    see core.precision.gelu)."""
    from advancedliteratemachinery_tpu.core.precision import gelu
    return gelu(x)



def downsample_mask(mask: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Max-pool a [B, H, W] 0/1 mask to out_hw (adaptive_max_pool2d analog
    for our integer-stride cases)."""
    B, H, W = mask.shape
    oh, ow = out_hw
    if (H, W) == (oh, ow):
        return mask
    sh, sw = H // oh, W // ow
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max,
        window_dimensions=(1, sh, sw), window_strides=(1, sh, sw), padding="VALID",
    )


class MaskedConv(nn.Module):
    """Conv that zeroes padded positions first and pools the mask to the
    output resolution (reference MaskedConv2d, feature_extractor.py:26)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask):
        x = x * mask[..., None].astype(x.dtype)
        # torch-style symmetric padding ((k-1)//2 per side): flax "SAME"
        # pads asymmetrically for stride-2 odd kernels, which shifts the
        # sampling grid and breaks checkpoint parity
        kh, kw = self.kernel_size
        pad = ((int((kh - 1) // 2),) * 2, (int((kw - 1) // 2),) * 2)
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding=pad,
            feature_group_count=self.groups, use_bias=self.use_bias,
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )(x)
        mask = downsample_mask(mask, (x.shape[1], x.shape[2]))
        return x, mask


class Stem(nn.Module):
    """4x spatial reduction stem (feature_extractor.py:307)."""

    embed_dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask):
        p = self.policy
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype, name=name)
        x, mask = MaskedConv(32, (3, 3), policy=p, name="conv0")(x, mask)
        x = ln("norm0")(x).astype(p.compute_dtype)
        x, mask = MaskedConv(32, (5, 5), (2, 2), groups=32, policy=p, name="conv1_0")(x, mask)
        x = ln("norm1")(x).astype(p.compute_dtype)
        x, mask = MaskedConv(64, (1, 1), policy=p, name="conv1_1")(x, mask)
        x = _gelu(x)
        x, mask = MaskedConv(64, (5, 5), (2, 2), groups=64, policy=p, name="conv2_0")(x, mask)
        x = ln("norm2")(x).astype(p.compute_dtype)
        x, mask = MaskedConv(self.embed_dim, (1, 1), policy=p, name="conv2_1")(x, mask)
        x = _gelu(x)
        x = nn.Dense(self.embed_dim, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="conv3")(x)
        return x, mask


class FocalModulation(nn.Module):
    """Focal modulation with masking (feature_extractor.py:62)."""

    dim: int
    focal_window: int = 3
    focal_level: int = 3
    max_kh: int = 1
    focal_factor: int = 2
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask):
        # x: [B, H, W, C]; mask: [B, H, W]
        p = self.policy
        C = self.dim
        m = mask[..., None].astype(x.dtype)
        f = nn.Dense(2 * C + self.focal_level + 1, dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="f")(x)
        f = f * m
        q, ctx, gates = jnp.split(f, [C, 2 * C], axis=-1)

        ctx_all = jnp.zeros_like(q)
        for level in range(self.focal_level):
            k = self.focal_factor * level + self.focal_window
            kh = min(k, self.max_kh)
            ctx = nn.Conv(C, (kh, k), padding="SAME", feature_group_count=C,
                          use_bias=False, dtype=p.compute_dtype,
                          param_dtype=p.param_dtype, name=f"focal_{level}")(ctx)
            ctx = _gelu(ctx) * m
            ctx_all = ctx_all + ctx * gates[..., level:level + 1]
        denom = jnp.sum(m, axis=(1, 2), keepdims=True) + 1e-10
        ctx_global = _gelu(jnp.sum(ctx, axis=(1, 2), keepdims=True) / denom)
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level:self.focal_level + 1]

        modulator = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                             name="h")(ctx_all)
        out = q * modulator
        out = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       name="proj")(out)
        return out * m


class FocalNetBlock(nn.Module):
    """Pre-LN focal block with layerscale (feature_extractor.py:142)."""

    dim: int
    mlp_ratio: float = 4.0
    focal_level: int = 3
    focal_window: int = 3
    max_kh: int = 1
    drop_path: float = 0.0
    layerscale_value: float = 1e-4
    use_layerscale: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        p = self.policy
        if self.use_layerscale:
            g1 = self.param("gamma_1", nn.initializers.constant(self.layerscale_value),
                            (self.dim,), p.param_dtype)
            g2 = self.param("gamma_2", nn.initializers.constant(self.layerscale_value),
                            (self.dim,), p.param_dtype)
        else:
            g1 = g2 = 1.0

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype, name="norm1")(x)
        h = FocalModulation(self.dim, self.focal_window, self.focal_level,
                            self.max_kh, policy=p, name="modulation")(
            h.astype(p.compute_dtype), mask)
        h = DropPath(self.drop_path, name="dp1")(h * g1, deterministic=deterministic)
        x = x + h

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype, name="norm2")(x)
        h = h.astype(p.compute_dtype)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="mlp_fc1")(h)
        h = _gelu(h)
        h = nn.Dense(self.dim, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="mlp_fc2")(h)
        h = DropPath(self.drop_path, name="dp2")(h * g2, deterministic=deterministic)
        x = x + h
        return x * mask[..., None].astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class FocalNetConfig(ConfigBase):
    in_chans: int = 3
    embed_dim: int = 96                 # base; tiny = 64
    depths: Tuple[int, ...] = (2, 2, 9, 2)   # base; tiny = (2,2,6,2)
    focal_levels: Tuple[int, ...] = (3, 3, 3, 3)
    focal_windows: Tuple[int, ...] = (3, 3, 3, 3)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    layerscale_value: float = 1e-6
    h_fm: int = 1                       # final feature-map height (1/2/4/8)

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i) for i in range(len(self.depths)))

    @property
    def out_dim(self) -> int:
        return self.stage_dims[-1]

    @property
    def strides(self) -> Tuple[int, ...]:
        # inter-stage height strides (width stride is always 1):
        # h after stem = H/4; h_fm=1 → strides (2,2,2) (feature_extractor.py:519-523)
        import math
        n_skip = int(math.log2(self.h_fm))
        return tuple([2] * (3 - n_skip) + [1] * n_skip)

    @property
    def max_khs(self) -> Tuple[int, ...]:
        if self.h_fm == 8:
            return (7, 7, 7, 7)
        if self.h_fm == 4:
            return (7, 3, 3, 3)
        return (7, 3, 3, 1)


FOCALNET_VARIANTS = {
    "tiny": FocalNetConfig(embed_dim=64, depths=(2, 2, 6, 2)),
    "base": FocalNetConfig(embed_dim=96, depths=(2, 2, 9, 2)),
}


class FocalNet(nn.Module):
    config: FocalNetConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        """x: [B, H, W, C] (H=32 typical), mask: [B, H, W] 0/1 (1=valid).
        Returns (features [B, h_fm, W/4, out_dim], mask [B, h_fm, W/4])."""
        cfg = self.config
        p = self.policy
        if mask is None:
            mask = jnp.ones(x.shape[:3], jnp.float32)
        mask = mask.astype(jnp.float32)

        x = x.astype(p.compute_dtype)
        x, mask = Stem(cfg.stage_dims[0], policy=p, name="stem")(x, mask)
        # post-stem patch norm (reference DownsamplingLayer(is_stem=True)
        # applies LN after flattening, feature_extractor.py:371)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="stem_norm")(x).astype(p.compute_dtype)

        import numpy as np
        dpr = [float(r) for r in
               np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))]
        di = 0
        for s, depth in enumerate(cfg.depths):
            for b in range(depth):
                x = FocalNetBlock(
                    cfg.stage_dims[s], cfg.mlp_ratio, cfg.focal_levels[s],
                    cfg.focal_windows[s], cfg.max_khs[s], dpr[di],
                    cfg.layerscale_value, policy=p, name=f"stage{s}_block{b}",
                )(x, mask, deterministic=deterministic)
                di += 1
            if s < len(cfg.depths) - 1:
                stride = cfg.strides[s]
                kh = cfg.max_khs[s] if cfg.max_khs[s] > 3 else 2
                kh = min(kh, 3)
                if stride == 1:
                    kh = max(3, kh)
                x, mask = MaskedConv(
                    cfg.stage_dims[s + 1], (kh, 3), (stride, 1), policy=p,
                    name=f"downsample{s}",
                )(x, mask)
                x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                                 name=f"ds_norm{s}")(x).astype(p.compute_dtype)

        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm")(x).astype(p.compute_dtype)
        x = x * mask[..., None].astype(x.dtype)
        return x, mask

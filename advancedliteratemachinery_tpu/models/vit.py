"""Vision Transformer backbone.

Behavioral parity target: the timm `VisionTransformer` as used by MGP-STR
(reference: OCR/MGP-STR/modules/mgp_str.py:46 `MGPSTR(VisionTransformer)`,
variant configs at mgp_str.py:175-231 — patch 4, img 32x128, dims
192/384/768/1024, depth 12/12/12/24, heads 3/6/12/16, mlp_ratio 4,
qkv_bias True). Note MGP-STR's forward_features (mgp_str.py:64-92) does NOT
apply the final encoder LayerNorm — `apply_final_norm` controls this.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.models.layers import EncoderBlock, PatchEmbed


@dataclasses.dataclass(frozen=True)
class ViTConfig(ConfigBase):
    img_size: Tuple[int, int] = (32, 128)
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path: float = 0.0
    use_cls_token: bool = True
    apply_final_norm: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size[0] // self.patch_size) * (self.img_size[1] // self.patch_size)

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_cls_token else 0)


class VisionTransformer(nn.Module):
    config: ViTConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, H, W, C] → token features [B, seq_len, D] (compute dtype)."""
        cfg = self.config
        p = self.policy
        B = x.shape[0]

        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, policy=p, name="patch_embed")(
            x.astype(p.compute_dtype)
        )

        if cfg.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.truncated_normal(0.02),
                (1, 1, cfg.embed_dim), p.param_dtype,
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, 1, cfg.embed_dim)).astype(x.dtype), x], axis=1
            )

        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.seq_len, cfg.embed_dim), p.param_dtype,
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        for i in range(cfg.depth):
            x = EncoderBlock(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias,
                cfg.dropout, cfg.attn_dropout, cfg.drop_path,
                policy=p, name=f"blocks_{i}",
            )(x, deterministic=deterministic)

        if cfg.apply_final_norm:
            x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype, name="norm")(x)
            x = x.astype(p.compute_dtype)
        return x


VIT_VARIANTS = {
    "tiny": ViTConfig(embed_dim=192, depth=12, num_heads=3),
    "small": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "base": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "large": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
}

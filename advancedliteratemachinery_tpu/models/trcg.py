"""TRCG: text region & content generator (LLaVA-style multimodal LM).

Behavioral parity target (reference AIGC/SceneVTG/TRCG): a LLaVA-1.5-7B
fine-tuned with LoRA r=128 (scripts/finetune_flash_attn.sh) to propose text
regions and contents from scene images (vendored llava/model/llava_arch.py:
vision tower → 2-layer MLP mm_projector → image tokens spliced into the LM
sequence; llava/train/train.py LoRA wiring).

TPU-native architecture (same shape, framework-scale defaults):
- vision tower: this framework's ViT (CLIP-style, cls dropped);
- mm projector: Linear-GELU-Linear (llava mm_projector 'mlp2x_gelu');
- language model: LLaMA-style decoder (RMSNorm, rotary attention, SwiGLU)
  with optional LoRA adapters on the attention projections (LoRADense);
- training loss: next-token CE with image positions masked (-100).

The reference trains with DeepSpeed ZeRO-3 + flash-attn; here parameter
sharding comes from parallel/sharding.py fsdp rules and attention is the
framework's fused path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import gelu as _gelu, Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.vit import VisionTransformer, ViTConfig


class LoRADense(nn.Module):
    """Dense with optional low-rank adapter: y = xW + α/r · x A B
    (llava finetune: lora_r 128, lora_alpha 256)."""

    features: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="base")(x)
        if self.lora_rank > 0:
            a = self.param("lora_A", nn.initializers.normal(0.02),
                           (x.shape[-1], self.lora_rank), p.param_dtype)
            b = self.param("lora_B", nn.initializers.zeros,
                           (self.lora_rank, self.features), p.param_dtype)
            scale = self.lora_alpha / self.lora_rank
            y = y + (x @ a.astype(x.dtype)) @ b.astype(x.dtype) * scale
        return y


def rotary(x: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """x [B,T,H,hd]; apply rotary embedding over hd."""
    hd = x.shape[-1]
    freqs = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    ang = positions[:, :, None, None] * jnp.asarray(freqs)[None, None, None, :]
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape)


@dataclasses.dataclass(frozen=True)
class TRCGConfig(ConfigBase):
    vocab_size: int = 32000
    hidden_size: int = 256
    num_layers: int = 4
    heads: int = 4
    max_seq: int = 512
    lora_rank: int = 0                 # 128 in the reference finetune
    lora_alpha: float = 256.0
    vision: ViTConfig = ViTConfig(img_size=(224, 224), patch_size=16,
                                  embed_dim=256, depth=4, num_heads=4,
                                  apply_final_norm=True)


class LlamaBlock(nn.Module):
    cfg: TRCGConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, positions, causal_bias):
        cfg = self.cfg
        p = self.policy
        D = cfg.hidden_size
        H = cfg.heads
        hd = D // H
        h = nn.RMSNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                       name="attn_norm")(x).astype(p.compute_dtype)
        q = LoRADense(D, cfg.lora_rank, cfg.lora_alpha, use_bias=False,
                      policy=p, name="q_proj")(h).reshape(*h.shape[:2], H, hd)
        k = LoRADense(D, cfg.lora_rank, cfg.lora_alpha, use_bias=False,
                      policy=p, name="k_proj")(h).reshape(*h.shape[:2], H, hd)
        v = LoRADense(D, cfg.lora_rank, cfg.lora_alpha, use_bias=False,
                      policy=p, name="v_proj")(h).reshape(*h.shape[:2], H, hd)
        q = rotary(q, positions)
        k = rotary(k, positions)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5) + causal_bias
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(*h.shape[:2], D)
        x = x + nn.Dense(D, use_bias=False, dtype=p.compute_dtype,
                         param_dtype=p.param_dtype, name="o_proj")(o)

        h = nn.RMSNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                       name="ffn_norm")(x).astype(p.compute_dtype)
        gate = nn.Dense(4 * D, use_bias=False, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name="gate_proj")(h)
        up = nn.Dense(4 * D, use_bias=False, dtype=p.compute_dtype,
                      param_dtype=p.param_dtype, name="up_proj")(h)
        h = nn.Dense(D, use_bias=False, dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="down_proj")(
            nn.silu(gate) * up)
        return x + h


@MODELS.register("trcg")
class TRCG(nn.Module):
    config: TRCGConfig = TRCGConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, input_ids, deterministic: bool = True
                 ) -> jnp.ndarray:
        """images [B,H,W,3]; input_ids [B,T] → logits [B, n_img + T, vocab].
        Image tokens are prepended (llava_arch.py prepare_inputs_for_
        multimodal) — label positions for them should be -100."""
        cfg = self.config
        p = self.policy
        vis = VisionTransformer(cfg.vision, policy=p, name="vision_tower")(
            images, deterministic=deterministic)[:, 1:]   # drop cls
        vis = nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                       param_dtype=p.param_dtype, name="mm_projector_fc1")(vis)
        vis = _gelu(vis)
        vis = nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                       param_dtype=p.param_dtype, name="mm_projector_fc2")(vis)

        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       param_dtype=p.param_dtype, name="embed_tokens")(input_ids)
        x = jnp.concatenate([vis, tok.astype(vis.dtype)], axis=1)
        B, T, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        causal = jnp.tril(jnp.ones((T, T), bool))
        bias = jnp.where(causal, 0.0, -1e9)[None, None]

        for i in range(cfg.num_layers):
            x = LlamaBlock(cfg, policy=p, name=f"layer_{i}")(x, positions, bias)
        x = nn.RMSNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                       name="final_norm")(x).astype(p.compute_dtype)
        return nn.Dense(cfg.vocab_size, use_bias=False, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype,
                        name="lm_head")(x).astype(jnp.float32)


def trcg_loss(logits: jnp.ndarray, input_ids: jnp.ndarray, n_image_tokens: int,
              ignore_prefix: int = 0) -> jnp.ndarray:
    """Next-token CE over text positions (image positions excluded; the
    first `ignore_prefix` text tokens — the instruction — can be masked
    too, as in llava supervised finetuning)."""
    text_logits = logits[:, n_image_tokens:-1]
    targets = input_ids[:, 1:]
    logp = jax.nn.log_softmax(text_logits, -1)
    nll = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
    T = targets.shape[1]
    valid = (jnp.arange(T)[None] >= ignore_prefix).astype(jnp.float32)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def lora_param_filter(path_tuple) -> bool:
    """Predicate: True for LoRA params (train only these, like the
    reference's PEFT finetune)."""
    return any("lora_" in str(getattr(k, "key", k)) for k in path_tuple)


def lora_optimizer(lr: float = 2e-4):
    """Optimizer that updates ONLY LoRA params; everything else is frozen.

    NOTE: plain `optax.masked(adam, mask)` does NOT freeze the unmasked
    leaves — it passes their raw gradients through — so this uses
    multi_transform with set_to_zero for the base weights.
    """
    import optax

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "lora" if lora_param_filter(p) else "frozen", params)

    return optax.multi_transform(
        {"lora": optax.adam(lr), "frozen": optax.set_to_zero()}, label_fn)

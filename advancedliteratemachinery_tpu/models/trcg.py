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
class CLIPVisionConfig(ConfigBase):
    """HF CLIPVisionModel shape (released tower: CLIP ViT-L/14-336)."""

    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    select_layer: int = -2     # llava mm_vision_select_layer (hidden_states idx)

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


def _quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x) (HF quick_gelu)."""
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPVisionTower(nn.Module):
    """Faithful CLIP vision transformer for the released TRCG stack
    (reference llava/model/multimodal_encoder/clip_encoder.py: HF
    CLIPVisionModel, feature_select takes hidden_states[select_layer] and
    drops CLS — so with select_layer=-2 the last encoder layer and the
    post-layernorm never run)."""

    config: CLIPVisionConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, pixels, deterministic: bool = True):
        """pixels [B, H, W, 3] → patch features [B, P, D]."""
        c, p = self.config, self.policy
        D = c.hidden_size
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (D,), p.param_dtype)
        x = nn.Conv(D, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), use_bias=False,
                    dtype=p.compute_dtype, param_dtype=p.param_dtype,
                    name="patch_embedding")(pixels.astype(p.compute_dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, D)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, D)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.num_positions, D), p.param_dtype)
        x = x + pos.astype(x.dtype)[None]
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="pre_layrnorm")(x).astype(p.compute_dtype)
        # hidden_states[0] is the pre-layrnorm output; [i+1] is after layer
        # i — run exactly the layers needed to reach select_layer
        n_run = c.layers + 1 + c.select_layer if c.select_layer < 0 \
            else c.select_layer
        H, hd = c.heads, D // c.heads
        for i in range(n_run):
            h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                             name=f"layers_{i}_norm1")(x).astype(
                                 p.compute_dtype)
            q = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"layers_{i}_q")(h).reshape(B, -1, H, hd)
            k = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"layers_{i}_k")(h).reshape(B, -1, H, hd)
            v = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"layers_{i}_v")(h).reshape(B, -1, H, hd)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
            a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, -1, D)
            x = x + nn.Dense(D, dtype=p.compute_dtype,
                             param_dtype=p.param_dtype,
                             name=f"layers_{i}_out")(o)
            h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                             name=f"layers_{i}_norm2")(x).astype(
                                 p.compute_dtype)
            h = nn.Dense(c.intermediate, dtype=p.compute_dtype,
                         param_dtype=p.param_dtype,
                         name=f"layers_{i}_fc1")(h)
            h = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"layers_{i}_fc2")(_quick_gelu(h))
            x = x + h
        return x[:, 1:]    # feature_select 'patch': drop CLS


@dataclasses.dataclass(frozen=True)
class TRCGConfig(ConfigBase):
    vocab_size: int = 32000
    hidden_size: int = 256
    num_layers: int = 4
    heads: int = 4
    max_seq: int = 512
    intermediate: Optional[int] = None  # SwiGLU width; None = 4*hidden
                                        # (vicuna-7B: 11008, not 4*4096)
    lora_rank: int = 0                 # 128 in the reference finetune
    lora_alpha: float = 256.0
    use_clip_tower: bool = False       # released stack: faithful CLIP-L/14
    clip: CLIPVisionConfig = CLIPVisionConfig()
    vision: ViTConfig = ViTConfig(img_size=(224, 224), patch_size=16,
                                  embed_dim=256, depth=4, num_heads=4,
                                  apply_final_norm=True)

    @property
    def ffn_dim(self) -> int:
        return self.intermediate or 4 * self.hidden_size

    @classmethod
    def released(cls, lora_rank: int = 0) -> "TRCGConfig":
        """The released TRCG stack: vicuna-7B LLaMA + CLIP ViT-L/14-336
        (reference scripts/finetune_flash_attn.sh, llava_arch.py)."""
        return cls(vocab_size=32000, hidden_size=4096, num_layers=32,
                   heads=32, max_seq=2048, intermediate=11008,
                   lora_rank=lora_rank, lora_alpha=256.0,
                   use_clip_tower=True, clip=CLIPVisionConfig())


class LlamaBlock(nn.Module):
    cfg: TRCGConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg, p = self.cfg, self.policy
        D = cfg.hidden_size
        self.attn_norm = nn.RMSNorm(dtype=jnp.float32,
                                    param_dtype=p.param_dtype)
        self.q_proj = LoRADense(D, cfg.lora_rank, cfg.lora_alpha,
                                use_bias=False, policy=p)
        self.k_proj = LoRADense(D, cfg.lora_rank, cfg.lora_alpha,
                                use_bias=False, policy=p)
        self.v_proj = LoRADense(D, cfg.lora_rank, cfg.lora_alpha,
                                use_bias=False, policy=p)
        self.o_proj = nn.Dense(D, use_bias=False, dtype=p.compute_dtype,
                               param_dtype=p.param_dtype)
        self.ffn_norm = nn.RMSNorm(dtype=jnp.float32,
                                   param_dtype=p.param_dtype)
        self.gate_proj = nn.Dense(cfg.ffn_dim, use_bias=False,
                                  dtype=p.compute_dtype,
                                  param_dtype=p.param_dtype)
        self.up_proj = nn.Dense(cfg.ffn_dim, use_bias=False,
                                dtype=p.compute_dtype,
                                param_dtype=p.param_dtype)
        self.down_proj = nn.Dense(D, use_bias=False, dtype=p.compute_dtype,
                                  param_dtype=p.param_dtype)

    def _qkv(self, h, positions):
        cfg = self.cfg
        H = cfg.heads
        hd = cfg.hidden_size // H
        q = self.q_proj(h).reshape(*h.shape[:2], H, hd)
        k = self.k_proj(h).reshape(*h.shape[:2], H, hd)
        v = self.v_proj(h).reshape(*h.shape[:2], H, hd)
        return rotary(q, positions), rotary(k, positions), v

    def _mlp(self, x):
        h = self.ffn_norm(x).astype(self.policy.compute_dtype)
        return x + self.down_proj(nn.silu(self.gate_proj(h)) * self.up_proj(h))

    def __call__(self, x, positions, causal_bias):
        hd = self.cfg.hidden_size // self.cfg.heads
        h = self.attn_norm(x).astype(self.policy.compute_dtype)
        q, k, v = self._qkv(h, positions)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5) + causal_bias
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(*h.shape[:2], -1)
        x = x + self.o_proj(o)
        return self._mlp(x)

    def seq_forward(self, x, positions, seq_mesh):
        """Sequence-parallel causal pass: attention runs as ring attention
        over the mesh's ``seq`` axis (parallel/ring_attention.py) instead
        of materialising the [S, S] bias — the long-context scale-out
        path (reference ceiling: TRCG's model_max_length 2048 on one GPU
        via flash-attn, llama_flash_attn_monkey_patch.py). x [B, S, D]
        with S sharded over ``seq``; projections/MLP stay S-sharded by
        propagation."""
        from advancedliteratemachinery_tpu.parallel.ring_attention import (
            ring_attention)

        h = self.attn_norm(x).astype(self.policy.compute_dtype)
        q, k, v = self._qkv(h, positions)
        o = ring_attention(q, k, v, seq_mesh, causal=True)
        x = x + self.o_proj(o.reshape(*h.shape[:2], -1))
        return self._mlp(x)

    def prefill(self, x, positions, causal_bias, cache_len: int):
        """Causal pass that also returns the KV cache padded to cache_len.
        → (out [B,T,D], (k_cache, v_cache) [B,cache_len,H,hd])."""
        hd = self.cfg.hidden_size // self.cfg.heads
        h = self.attn_norm(x).astype(self.policy.compute_dtype)
        q, k, v = self._qkv(h, positions)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5) + causal_bias
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(*h.shape[:2], -1)
        x = x + self.o_proj(o)
        pad = cache_len - k.shape[1]
        kc = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vc = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return self._mlp(x), (kc, vc)

    def step(self, x_t, caches, pos_idx):
        """One incremental decode step. x_t [B,1,D]; pos_idx scalar int —
        the absolute position of this token. Cache slots >= pos_idx are
        masked out of the softmax."""
        hd = self.cfg.hidden_size // self.cfg.heads
        kc, vc = caches
        h = self.attn_norm(x_t).astype(self.policy.compute_dtype)
        pos = jnp.full((x_t.shape[0], 1), pos_idx)
        q, k_t, v_t = self._qkv(h, pos)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k_t, pos_idx, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v_t, pos_idx, axis=1)
        L = kc.shape[1]
        bias = jnp.where(jnp.arange(L) <= pos_idx, 0.0, -1e9)[None, None, None]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kc) / (hd ** 0.5) + bias
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, vc).reshape(*x_t.shape[:2], -1)
        x_t = x_t + self.o_proj(o)
        return self._mlp(x_t), (kc, vc)


@MODELS.register("trcg")
class TRCG(nn.Module):
    config: TRCGConfig = TRCGConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg, p = self.config, self.policy
        if cfg.use_clip_tower:
            self.vision_tower = CLIPVisionTower(cfg.clip, policy=p)
        else:
            self.vision_tower = VisionTransformer(cfg.vision, policy=p)
        self.mm_projector_fc1 = nn.Dense(cfg.hidden_size,
                                         dtype=p.compute_dtype,
                                         param_dtype=p.param_dtype)
        self.mm_projector_fc2 = nn.Dense(cfg.hidden_size,
                                         dtype=p.compute_dtype,
                                         param_dtype=p.param_dtype)
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                     param_dtype=p.param_dtype)
        self.layers = [LlamaBlock(cfg, policy=p, name=f"layer_{i}")
                       for i in range(cfg.num_layers)]
        self.final_norm = nn.RMSNorm(dtype=jnp.float32,
                                     param_dtype=p.param_dtype)
        self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                dtype=p.compute_dtype,
                                param_dtype=p.param_dtype)

    def _prefix(self, images, input_ids, deterministic):
        """Image tokens prepended to the embedded text (llava_arch.py
        prepare_inputs_for_multimodal)."""
        vis = self.vision_tower(images, deterministic=deterministic)
        if not self.config.use_clip_tower:
            vis = vis[:, 1:]      # CLIP tower already drops CLS ('patch')
        vis = self.mm_projector_fc2(_gelu(self.mm_projector_fc1(vis)))
        tok = self.embed_tokens(input_ids)
        return jnp.concatenate([vis, tok.astype(vis.dtype)], axis=1)

    def _head(self, x):
        x = self.final_norm(x).astype(self.policy.compute_dtype)
        return self.lm_head(x).astype(jnp.float32)

    def __call__(self, images, input_ids, deterministic: bool = True
                 ) -> jnp.ndarray:
        """images [B,H,W,3]; input_ids [B,T] → logits [B, n_img + T, vocab].
        Image token label positions should be -100."""
        x = self._prefix(images, input_ids, deterministic)
        B, T, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        bias = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e9)[None, None]
        for layer in self.layers:
            x = layer(x, positions, bias)
        return self._head(x)

    def seq_call(self, images, input_ids, seq_mesh,
                 deterministic: bool = True) -> jnp.ndarray:
        """__call__ with sequence-parallel layers: the combined prefix
        (image tokens + text) is sharded over the mesh's ``seq`` axis and
        every block attends via ring attention. Total sequence length
        must divide the seq axis size."""
        x = self._prefix(images, input_ids, deterministic)
        B, T, _ = x.shape
        n_seq = seq_mesh.shape["seq"]
        if T % n_seq:
            raise ValueError(
                f"sequence length {T} (image+text tokens) not divisible "
                f"by seq axis size {n_seq}")
        positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        for layer in self.layers:
            x = layer.seq_forward(x, positions, seq_mesh)
        return self._head(x)

    def prefill(self, images, input_ids, cache_len: int):
        """Prompt pass (image prefix + instruction). Returns (last-position
        logits [B, vocab], caches, prefix_len)."""
        x = self._prefix(images, input_ids, deterministic=True)
        B, T, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        bias = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e9)[None, None]
        caches = []
        for layer in self.layers:
            x, c = layer.prefill(x, positions, bias, cache_len)
            caches.append(c)
        return self._head(x[:, -1:])[:, 0], tuple(caches), T

    def decode_step(self, token_ids, caches, pos_idx):
        """token_ids [B] → (logits [B, vocab], updated caches)."""
        x = self.embed_tokens(token_ids[:, None]).astype(
            self.policy.compute_dtype)
        new_caches = []
        for layer, c in zip(self.layers, caches):
            x, c = layer.step(x, c, pos_idx)
            new_caches.append(c)
        return self._head(x)[:, 0], tuple(new_caches)


def trcg_generate(model: TRCG, variables, images, input_ids,
                  max_new_tokens: int = 64, eos_id: int = 2,
                  temperature: float = 0.0,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """KV-cached autoregressive generation (inference.py:169
    model.generate(use_cache=True) equivalent) as one jitted
    prefill + `lax.scan` decode.

    Greedy when temperature == 0, else temperature sampling. Returns
    [B, max_new_tokens] int32; positions after EOS are padded with eos_id
    (KeywordsStoppingCriteria analog — fixed-shape early-exit masking).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    cache_len = input_ids.shape[1] + model.config.vision.num_patches \
        + max_new_tokens

    logits0, caches, prefix_len = model.apply(
        variables, images, input_ids, cache_len, method=TRCG.prefill)

    def sample(logits, key):
        if temperature > 0:
            return jax.random.categorical(key, logits / temperature, -1)
        return jnp.argmax(logits, -1)

    k0, rng = jax.random.split(rng)
    tok0 = sample(logits0, k0).astype(jnp.int32)
    done0 = tok0 == eos_id

    def body(carry, key):
        tok, done, caches, pos = carry
        logits, caches = model.apply(variables, tok, caches, pos,
                                     method=TRCG.decode_step)
        nxt = sample(logits, key).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        done = done | (nxt == eos_id)
        return (nxt, done, caches, pos + 1), nxt

    keys = jax.random.split(rng, max_new_tokens - 1)
    (_, _, _, _), toks = jax.lax.scan(
        body, (tok0, done0, caches, prefix_len), keys)
    return jnp.concatenate([tok0[None], toks], axis=0).swapaxes(0, 1)


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

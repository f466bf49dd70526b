"""LVTR: conditional diffusion renderer for scene-text generation.

Behavioral parity target (reference AIGC/SceneVTG/LVTR):
- DALLE2-pytorch-style conditional Unet + Decoder (vendored
  dalle2_pytorch/dalle2_pytorch.py; configs/cfgs_lvtr.py) conditioned on
  style image, text-removal image, glyph-render image, and line/word
  polygon masks, with a text condition from a character encoder.
- Training (train_lvtr.py:297-344): diffusion loss + background loss
  (masked MSE of the denoised x0 against the source outside text regions)
  + foreground OCR-aware loss (MSE between frozen-CRNN `ExCTC` features of
  the denoised and real text regions, :320-321).
- Frozen CRNN recognizer `ExCTC` with `get_image_features` (recognizer/).

TPU-first: the DDPM sampler is a fixed-length `lax.scan` over timesteps;
training draws one timestep per sample (standard DDPM) — everything static
shape, bf16 compute, fp32 schedule math.
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
from advancedliteratemachinery_tpu.core.registry import MODELS


# ---------------- frozen CRNN recognizer (ExCTC) ----------------


class ExCTC(nn.Module):
    """CRNN text recognizer with a feature-extraction hook
    (reference recognizer ExCTC; get_image_features used by the
    OCR-aware loss at train_lvtr.py:320)."""

    num_classes: int = 97
    width: int = 32
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, return_features: bool = False):
        p = self.policy
        x = images.astype(p.compute_dtype)
        w = self.width
        for i, (ch, stride) in enumerate([(w, (2, 2)), (2 * w, (2, 2)),
                                          (4 * w, (2, 1)), (8 * w, (2, 1))]):
            x = nn.Conv(ch, (3, 3), stride, padding="SAME",
                        dtype=p.compute_dtype, param_dtype=p.param_dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        feats = x                                    # [B, H/16, W/4, 8w]
        if return_features:
            return feats
        B, H, W, C = feats.shape
        seq = jnp.mean(feats, axis=1)                # [B, W, C]
        logits = nn.Dense(self.num_classes, dtype=p.compute_dtype,
                          param_dtype=p.param_dtype,
                          name="ctc_head")(seq)
        return logits.astype(jnp.float32)

    def get_image_features(self, images):
        return self.__call__(images, return_features=True)


# ---------------- conditional U-Net ----------------


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock(nn.Module):
    ch: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, temb):
        p = self.policy
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm1")(x)
        h = nn.silu(h).astype(p.compute_dtype)
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=p.compute_dtype,
                    param_dtype=p.param_dtype, name="conv1")(h)
        h = h + nn.Dense(self.ch, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name="temb_proj")(nn.silu(temb))[:, None, None]
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm2")(h)
        h = nn.silu(h).astype(p.compute_dtype)
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=p.compute_dtype,
                    param_dtype=p.param_dtype, name="conv2")(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name="skip")(x)
        return x + h


class TextCrossAttention(nn.Module):
    ch: int
    heads: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, text_emb):
        p = self.policy
        B, H, W, C = x.shape
        hd = C // self.heads
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm")(x)
        h = h.reshape(B, H * W, C).astype(p.compute_dtype)
        q = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="q")(h).reshape(B, H * W, self.heads, hd)
        k = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="k")(text_emb).reshape(B, -1, self.heads, hd)
        v = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="v")(text_emb).reshape(B, -1, self.heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, H * W, C)
        o = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="proj")(o)
        return x + o.reshape(B, H, W, C)


@dataclasses.dataclass(frozen=True)
class LVTRConfig(ConfigBase):
    base_ch: int = 64
    ch_mults: Tuple[int, ...] = (1, 2, 4)
    charset_size: int = 97
    text_embed_dim: int = 128
    max_text_len: int = 32
    timesteps: int = 1000
    sample_steps: int = 50            # DDIM-style strided sampling
    backloss: float = 1.0
    foreloss: float = 0.01
    cond_channels: int = 3 + 3 + 3 + 1 + 1  # style + removal + render + 2 masks


@MODELS.register("lvtr")
class LVTRUnet(nn.Module):
    config: LVTRConfig = LVTRConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x_noisy, t, conditions: Dict[str, jnp.ndarray]):
        """x_noisy [B,H,W,3]; t [B]; conditions: images_style / images_removal
        / images_render [B,H,W,3], line_poly_mask / word_poly_mask [B,H,W,1],
        text_ids [B,L]. → predicted noise [B,H,W,3]."""
        cfg = self.config
        p = self.policy
        temb = nn.Dense(cfg.base_ch * 4, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name="temb1")(
            timestep_embedding(t, cfg.base_ch).astype(p.compute_dtype))
        temb = nn.Dense(cfg.base_ch * 4, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name="temb2")(nn.silu(temb))

        text = nn.Embed(cfg.charset_size, cfg.text_embed_dim,
                        param_dtype=p.param_dtype, name="char_embed")(
            conditions["text_ids"])
        text = text + nn.Embed(cfg.max_text_len, cfg.text_embed_dim,
                               param_dtype=p.param_dtype, name="char_pos")(
            jnp.arange(conditions["text_ids"].shape[1]))[None]

        cond = jnp.concatenate(
            [conditions["images_style"], conditions["images_removal"],
             conditions["images_render"], conditions["line_poly_mask"],
             conditions["word_poly_mask"]], axis=-1)
        h = jnp.concatenate([x_noisy, cond.astype(x_noisy.dtype)], axis=-1)
        h = nn.Conv(cfg.base_ch, (3, 3), padding="SAME", dtype=p.compute_dtype,
                    param_dtype=p.param_dtype, name="stem")(
            h.astype(p.compute_dtype))

        skips = []
        for li, mult in enumerate(cfg.ch_mults):
            ch = cfg.base_ch * mult
            h = ResnetBlock(ch, policy=p, name=f"down{li}_res")(h, temb)
            skips.append(h)
            if li < len(cfg.ch_mults) - 1:
                h = nn.Conv(ch, (3, 3), (2, 2), padding="SAME",
                            dtype=p.compute_dtype, param_dtype=p.param_dtype,
                            name=f"down{li}_ds")(h)

        h = ResnetBlock(h.shape[-1], policy=p, name="mid_res1")(h, temb)
        h = TextCrossAttention(h.shape[-1], policy=p, name="mid_attn")(
            h, text.astype(h.dtype))
        h = ResnetBlock(h.shape[-1], policy=p, name="mid_res2")(h, temb)

        for li, mult in reversed(list(enumerate(cfg.ch_mults))):
            ch = cfg.base_ch * mult
            h = jnp.concatenate([h, skips[li]], axis=-1)
            h = ResnetBlock(ch, policy=p, name=f"up{li}_res")(h, temb)
            if li > 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=p.compute_dtype,
                            param_dtype=p.param_dtype, name=f"up{li}_us")(h)

        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="out_norm")(h)
        h = nn.silu(h).astype(p.compute_dtype)
        return nn.Conv(3, (3, 3), padding="SAME", dtype=p.compute_dtype,
                       param_dtype=p.param_dtype,
                       name="out")(h).astype(jnp.float32)


# ---------------- DDPM schedule + losses + sampler ----------------


def cosine_betas(T: int) -> np.ndarray:
    s = 0.008
    t = np.linspace(0, T, T + 1) / T
    f = np.cos((t + s) / (1 + s) * math.pi / 2) ** 2
    betas = 1 - f[1:] / f[:-1]
    return np.clip(betas, 0, 0.999)


class DDPM:
    def __init__(self, cfg: LVTRConfig):
        self.cfg = cfg
        betas = cosine_betas(cfg.timesteps)
        alphas = 1.0 - betas
        self.alphas_cum = jnp.asarray(np.cumprod(alphas))
        self.betas = jnp.asarray(betas)

    def q_sample(self, x0, t, noise):
        ac = self.alphas_cum[t][:, None, None, None]
        return jnp.sqrt(ac) * x0 + jnp.sqrt(1 - ac) * noise

    def pred_x0(self, x_t, t, eps):
        ac = self.alphas_cum[t][:, None, None, None]
        return (x_t - jnp.sqrt(1 - ac) * eps) / jnp.sqrt(ac)

    def training_losses(self, unet_apply, recognizer_apply, params, rec_params,
                        x0, conditions, rng) -> Dict[str, jnp.ndarray]:
        """loss = eps-MSE + backloss·masked-bg-MSE + foreloss·OCR-feat-MSE
        (train_lvtr.py:297-327)."""
        cfg = self.cfg
        B = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, cfg.timesteps)
        noise = jax.random.normal(rng_n, x0.shape)
        x_t = self.q_sample(x0, t, noise)
        eps = unet_apply(params, x_t, t, conditions)
        loss_dm = jnp.mean((eps - noise) ** 2)

        x0_hat = jnp.clip(self.pred_x0(x_t, t, eps), 0.0, 1.0)
        lm = conditions["line_poly_mask"]
        bk = 1.0 - lm
        loss_bg = (jnp.sum(bk * (x0_hat - x0) ** 2)
                   / jnp.maximum(jnp.sum(bk) * x0.shape[-1], 1.0)
                   ) * x0.shape[-1]
        f_hat = recognizer_apply(rec_params, lm * x0_hat)
        f_real = jax.lax.stop_gradient(recognizer_apply(rec_params, lm * x0))
        loss_fg = jnp.mean((f_hat - f_real) ** 2)

        total = loss_dm + cfg.backloss * loss_bg + cfg.foreloss * loss_fg
        return {"loss": total, "loss_dm": loss_dm, "loss_background": loss_bg,
                "loss_foreground": loss_fg}

    def sample(self, unet_apply, params, conditions, shape, rng):
        """Strided DDIM (eta=0) sampler as one lax.scan."""
        cfg = self.cfg
        steps = np.linspace(cfg.timesteps - 1, 0, cfg.sample_steps).astype(np.int64)
        x = jax.random.normal(rng, shape)

        def body(x, i):
            t = jnp.full((shape[0],), steps_arr[i], jnp.int32)
            eps = unet_apply(params, x, t, conditions)
            x0_hat = jnp.clip(self.pred_x0(x, t, eps), -1.0, 1.5)
            prev = jnp.where(i + 1 < len(steps), steps_arr[jnp.minimum(i + 1,
                             len(steps) - 1)], 0)
            ac_prev = jnp.where(i + 1 < len(steps), self.alphas_cum[prev], 1.0)
            x_prev = (jnp.sqrt(ac_prev) * x0_hat
                      + jnp.sqrt(1 - ac_prev) * eps)
            return x_prev, None

        steps_arr = jnp.asarray(steps)
        x, _ = jax.lax.scan(body, x, jnp.arange(len(steps)))
        return jnp.clip(x, 0.0, 1.0)

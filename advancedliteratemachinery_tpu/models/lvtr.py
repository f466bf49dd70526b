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


# ---------------- faithful dalle2-pytorch Unet (released-ckpt path) ----------------


@dataclasses.dataclass(frozen=True)
class DalleUnetConfig(ConfigBase):
    """Shape of the released LVTR Unet (reference configs/cfgs_lvtr.py
    unet_cfgs + the Decoder's cast_model_parameters: cond_on_image_embeds
    True for the first unet, channels_out doubled by learned variance)."""

    dim: int = 128
    cond_dim: int = 128
    image_embed_dim: int = 512
    text_embed_dim: int = 512
    dim_mults: Tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    channels: int = 3
    num_resnet_blocks: int = 2
    num_time_tokens: int = 2
    num_image_tokens: int = 4
    max_text_len: int = 128
    attn_heads: int = 16
    attn_dim_head: int = 32
    cross_heads: int = 8
    cross_dim_head: int = 64
    groups: int = 8
    learned_variance: bool = True
    init_cross_embed_kernel_sizes: Tuple[int, ...] = (3, 7, 15)

    @property
    def channels_out(self) -> int:
        return self.channels * (2 if self.learned_variance else 1)

    @property
    def time_cond_dim(self) -> int:
        return self.dim * 4


def _ln(name, use_bias=False):
    """dalle2's custom LayerNorm: g-only, biased variance, eps 1e-5."""
    return nn.LayerNorm(use_bias=use_bias, epsilon=1e-5, dtype=jnp.float32,
                        name=name)


class _DalleCrossAttention(nn.Module):
    """dalle2 CrossAttention: pre-LN(g-only), per-head kv, one null kv per
    head, q/k each scaled by sqrt(dim_head**-.5), out proj + LN."""

    dim: int
    cond_dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context):
        B, N, _ = x.shape
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5
        h = _ln("norm")(x).astype(x.dtype)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, -1, self.heads, self.dim_head)
        v = v.reshape(B, -1, self.heads, self.dim_head)
        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head))
        nk = jnp.broadcast_to(null_kv[0].astype(k.dtype),
                              (B, 1, self.heads, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1].astype(v.dtype),
                              (B, 1, self.heads, self.dim_head))
        k = jnp.concatenate([nk, k], axis=1)
        v = jnp.concatenate([nv, v], axis=1)
        q = q * (scale ** 0.5)
        k = k * (scale ** 0.5)
        s = jnp.einsum("bihd,bjhd->bhij", q, k)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhij,bjhd->bihd", a, v).reshape(B, N, inner)
        o = nn.Dense(self.dim, use_bias=False, name="to_out")(o)
        return _ln("out_norm")(o).astype(x.dtype)


class _DalleSelfAttention(nn.Module):
    """dalle2 Attention as used at the bottleneck: kv shared across heads
    (to_kv → 2*dim_head), q scaled twice (scale then sqrt(scale) — the
    vendored code's behavior, reproduced exactly)."""

    dim: int
    heads: int = 16
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5
        h = _ln("norm")(x).astype(x.dtype)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        kv = nn.Dense(2 * self.dim_head, use_bias=False, name="to_kv")(h)
        k, v = jnp.split(kv, 2, axis=-1)          # [B, N, hd] shared heads
        q = q.reshape(B, N, self.heads, self.dim_head) * scale
        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head))
        k = jnp.concatenate(
            [jnp.broadcast_to(null_kv[0].astype(k.dtype),
                              (B, 1, self.dim_head)), k], axis=1)
        v = jnp.concatenate(
            [jnp.broadcast_to(null_kv[1].astype(v.dtype),
                              (B, 1, self.dim_head)), v], axis=1)
        q = q * (scale ** 0.5)
        k = k * (scale ** 0.5)
        s = jnp.einsum("bihd,bjd->bhij", q, k)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhij,bjd->bihd", a, v).reshape(B, N, inner)
        o = nn.Dense(self.dim, use_bias=False, name="to_out")(o)
        return _ln("out_norm")(o).astype(x.dtype)


class _DalleResBlock(nn.Module):
    """dalle2 ResnetBlock: Block(conv→GN→time scale_shift→SiLU), optional
    cross-attention over the conditioning tokens, Block2, residual conv."""

    dim_out: int
    cond: bool = False
    cond_dim: int = 128
    groups: int = 8
    cross_heads: int = 8
    cross_dim_head: int = 64

    @nn.compact
    def __call__(self, x, t_emb, c=None):
        ss = nn.Dense(self.dim_out * 2, name="time_mlp")(nn.silu(t_emb))
        scale, shift = ss[:, : self.dim_out], ss[:, self.dim_out:]
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME",
                    name="block1_conv")(x)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=jnp.float32,
                         name="block1_norm")(h).astype(x.dtype)
        h = h * (scale[:, None, None] + 1.0) + shift[:, None, None]
        h = nn.silu(h)
        if self.cond:
            B, H, W, C = h.shape
            hs = h.reshape(B, H * W, C)
            hs = _DalleCrossAttention(
                C, self.cond_dim, heads=self.cross_heads,
                dim_head=self.cross_dim_head, name="cross_attn")(hs, c) + hs
            h = hs.reshape(B, H, W, C)
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME",
                    name="block2_conv")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=jnp.float32,
                         name="block2_norm")(h).astype(x.dtype)
        h = nn.silu(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), name="res_conv")(x)
        return h + x


def _pixel_unshuffle(x):
    """torch Rearrange 'b c (h 2) (w 2) -> b (c 2 2) h w' in NHWC."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)             # [B, h, w, C, s1, s2]
    return x.reshape(B, H // 2, W // 2, C * 4)


def _pixel_shuffle(x):
    """torch nn.PixelShuffle(2) in NHWC (channel blocks (o, 2, 2))."""
    B, H, W, C = x.shape
    o = C // 4
    x = x.reshape(B, H, W, o, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)             # [B, H, i, W, j, o]
    return x.reshape(B, H * 2, W * 2, o)


@MODELS.register("lvtr_dalle_unet")
class LVTRDalleUnet(nn.Module):
    """Faithful flax twin of the reference's modified dalle2-pytorch Unet
    (dalle2_pytorch.py:1281 at the cfgs_lvtr.py configuration: CrossEmbed
    init conv over x|removal|line-mask|word-mask, time+image tokens with
    text cross-attention from stage 2 down, pixel-unshuffle downsample /
    pixel-shuffle upsample, bottleneck self-attention, learned-variance
    6-channel output). The simplified `LVTRUnet` above remains the
    framework-scale fast path; this module exists so released `lvtr.pth`
    checkpoints import and render."""

    config: DalleUnetConfig = DalleUnetConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, t, image_embed, text_encodings,
                 conditions: Dict[str, jnp.ndarray]):
        """x [B,H,W,3] noisy image (model space); t [B] float timesteps;
        image_embed [B, image_embed_dim]; text_encodings
        [B, L, text_embed_dim] (zero rows = padding); conditions:
        images_removal [B,H,W,3] and line/word_poly_mask [B,H,W,1] in
        [0, 1] (normalized to [-1, 1] inside, Unet.forward:1790-1812)."""
        cfg = self.config
        B = x.shape[0]
        dt = x.dtype

        h = jnp.concatenate(
            [x,
             conditions["images_removal"].astype(dt) * 2.0 - 1.0,
             conditions["line_poly_mask"].astype(dt) * 2.0 - 1.0,
             conditions["word_poly_mask"].astype(dt) * 2.0 - 1.0], axis=-1)

        # CrossEmbedLayer init conv (kernels 3/7/15, stride 1)
        ks = sorted(cfg.init_cross_embed_kernel_sizes)
        dim_scales = [int(cfg.dim / (2 ** i)) for i in range(1, len(ks))]
        dim_scales.append(cfg.dim - sum(dim_scales))
        maps = [nn.Conv(dsc, (k, k), padding="SAME",
                        name=f"init_conv_{i}")(h)
                for i, (k, dsc) in enumerate(zip(ks, dim_scales))]
        h = jnp.concatenate(maps, axis=-1)
        r = h

        # time conditioning (SinusoidalPosEmb → Linear → GELU)
        half = cfg.dim // 2
        emb = jnp.exp(jnp.arange(half) * -(math.log(10000) / (half - 1)))
        ang = t.astype(jnp.float32)[:, None] * emb[None]
        sin_emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)],
                                  axis=-1).astype(dt)
        time_hiddens = nn.gelu(
            nn.Dense(cfg.time_cond_dim, name="to_time_hiddens")(sin_emb),
            approximate=False)
        time_tokens = nn.Dense(cfg.cond_dim * cfg.num_time_tokens,
                               name="to_time_tokens")(time_hiddens)
        time_tokens = time_tokens.reshape(B, cfg.num_time_tokens,
                                          cfg.cond_dim)
        t_cond = nn.Dense(cfg.time_cond_dim, name="to_time_cond")(
            time_hiddens)

        # image-embed conditioning (cond_on_image_embeds=True after the
        # Decoder's cast_model_parameters; add_image_embeds_to_time)
        img_hiddens = nn.gelu(
            nn.Dense(cfg.time_cond_dim, name="to_image_hiddens")(
                image_embed.astype(dt)), approximate=False)
        t_cond = t_cond + img_hiddens
        image_tokens = nn.Dense(cfg.cond_dim * cfg.num_image_tokens,
                                name="image_to_tokens")(
            image_embed.astype(dt)).reshape(B, cfg.num_image_tokens,
                                            cfg.cond_dim)

        # text tokens: project, truncate/pad to max_text_len, null-fill
        text_tokens = nn.Dense(cfg.cond_dim, name="text_to_cond")(
            text_encodings.astype(dt))
        mask = jnp.any(text_encodings != 0.0, axis=-1)
        L = text_tokens.shape[1]
        if L > cfg.max_text_len:
            text_tokens = text_tokens[:, : cfg.max_text_len]
            mask = mask[:, : cfg.max_text_len]
        elif L < cfg.max_text_len:
            text_tokens = jnp.pad(text_tokens,
                                  ((0, 0), (0, cfg.max_text_len - L), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, cfg.max_text_len - L)))
        null_text = self.param("null_text_embed",
                               nn.initializers.normal(1.0),
                               (cfg.max_text_len, cfg.cond_dim))
        text_tokens = jnp.where(mask[..., None], text_tokens,
                                null_text.astype(dt)[None])

        c = jnp.concatenate([time_tokens, image_tokens], axis=1)
        mid_c = jnp.concatenate([c, text_tokens], axis=1)
        c = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm_cond")(c).astype(dt)
        mid_c = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="norm_mid_cond")(mid_c).astype(dt)

        dims = [cfg.dim] + [cfg.dim * m for m in cfg.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_stages = len(in_out)

        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_first = ind == 0
            is_last = ind == n_stages - 1
            cond = not is_first
            h = _DalleResBlock(dim_in, cond=False, groups=cfg.groups,
                               name=f"downs_{ind}_init")(h, t_cond)
            for j in range(cfg.num_resnet_blocks):
                h = _DalleResBlock(
                    dim_in, cond=cond, cond_dim=cfg.cond_dim,
                    groups=cfg.groups, cross_heads=cfg.cross_heads,
                    cross_dim_head=cfg.cross_dim_head,
                    name=f"downs_{ind}_block{j}")(h, t_cond, c)
                skips.append(h)
            skips.append(h)            # post-attention skip (attn=Identity)
            if not is_last:
                h = nn.Conv(dim_out, (1, 1),
                            name=f"downs_{ind}_ds")(_pixel_unshuffle(h))
            else:
                h = nn.Conv(dim_out, (1, 1), name=f"downs_{ind}_ds")(h)

        h = _DalleResBlock(dims[-1], cond=True, cond_dim=cfg.cond_dim,
                           groups=cfg.groups, cross_heads=cfg.cross_heads,
                           cross_dim_head=cfg.cross_dim_head,
                           name="mid_block1")(h, t_cond, mid_c)
        B_, H_, W_, C_ = h.shape
        hs = h.reshape(B_, H_ * W_, C_)
        hs = hs + _DalleSelfAttention(C_, heads=cfg.attn_heads,
                                      dim_head=cfg.attn_dim_head,
                                      name="mid_attn")(hs)
        h = hs.reshape(B_, H_, W_, C_)
        h = _DalleResBlock(dims[-1], cond=True, cond_dim=cfg.cond_dim,
                           groups=cfg.groups, cross_heads=cfg.cross_heads,
                           cross_dim_head=cfg.cross_dim_head,
                           name="mid_block2")(h, t_cond, mid_c)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == n_stages - 1
            cond = not is_last
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = _DalleResBlock(
                dim_out, cond=cond, cond_dim=cfg.cond_dim,
                groups=cfg.groups, cross_heads=cfg.cross_heads,
                cross_dim_head=cfg.cross_dim_head,
                name=f"ups_{ind}_init")(h, t_cond, c)
            for j in range(cfg.num_resnet_blocks):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = _DalleResBlock(
                    dim_out, cond=cond, cond_dim=cfg.cond_dim,
                    groups=cfg.groups, cross_heads=cfg.cross_heads,
                    cross_dim_head=cfg.cross_dim_head,
                    name=f"ups_{ind}_block{j}")(h, t_cond, c)
            if not is_last:
                h = nn.Conv(dim_in * 4, (1, 1), name=f"ups_{ind}_us")(h)
                h = _pixel_shuffle(nn.silu(h))

        h = jnp.concatenate([h, r], axis=-1)
        h = _DalleResBlock(cfg.dim, cond=False, groups=cfg.groups,
                           name="final_resnet_block")(h, t_cond)
        return nn.Conv(cfg.channels_out, (1, 1), name="to_out")(h)

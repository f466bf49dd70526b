"""VLPT-STD: vision-language pre-training for scene-text detection.

Behavioral parity target (reference OCR/VLPT-STD):
- Image_Encoder (models/encoders.py:211): torchvision ResNet50 →
  FPN (1x1 laterals 256, nearest top-down, 4-level concat at c3
  resolution = 1024ch) → conv1x1 stride-2 proj to embed_dim → cls token +
  learned pos embed → pre-norm ViT blocks (separate q/k/v projections,
  encoders.py:84 Attention) → LayerNorm(1e-6).
- Text_Encoder (:293): BertEmbeddings (word + position + token-type + LN
  1e-12) → the same pre-norm blocks with the text key mask → LN(1e-6).
- Co_Encoder (:360): Cross_Block (:170) — masked self-attention on
  norm1(x), cross-attention with norm2 applied to BOTH query and memory,
  then MLP on norm3.
- VLPT (models/VLPT.py:29): per-modality token-type embeddings, CLIP-style
  projections with clamped logit scales (:101,112), word-in-image hard
  subword mining (:80), MLMHead = BertPredictionHeadTransform + decoder
  tied to the word embeddings (:14).
- Losses (models/losses.py): MLM CE ignore -100 (:9); two-way image-text
  contrastive (:26) — the reference all_gathers features across NCCL
  ranks; under pjit the batch is logically global so the same math needs
  no explicit collective; word-in-image global-local contrast (:65).

Config defaults follow conf/config.yaml (embed 384, heads 6, image/text/
co depths 1/3/4, image 512, text len 30).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import gelu as _gelu, Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS

BN_MOMENTUM = 0.9


@dataclasses.dataclass(frozen=True)
class VLPTConfig(ConfigBase):
    embed_dim: int = 384
    vocab_size: int = 30522
    max_text_len: int = 30
    image_size: int = 512
    image_depth: int = 1
    text_depth: int = 3
    co_depth: int = 4
    heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    fpn_dim: int = 256
    resnet_base: int = 64                 # 64 → true ResNet50 widths
    resnet_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    false_text_length: int = 64

    @property
    def num_patches(self) -> int:
        return (self.image_size // 16) ** 2


# --------------- shared post-norm layer (kept for GEM and others) --------


class TransformerEncoderLayer(nn.Module):
    dim: int
    heads: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, kv=None):
        p = self.policy
        B, T, D = x.shape
        hd = D // self.heads
        kv_in = x if kv is None else kv
        q = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="q")(x).reshape(B, T, self.heads, hd)
        k = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="k")(kv_in).reshape(B, -1, self.heads, hd)
        v = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="v")(kv_in).reshape(B, -1, self.heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        if mask is not None:
            s = jnp.where(mask[:, None, None, :] > 0, s, -1e9)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, T, D)
        o = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="out")(o)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm1")(x + o).astype(p.compute_dtype)
        h = nn.Dense(4 * D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff1")(x)
        h = _gelu(h)
        h = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff2")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                            param_dtype=p.param_dtype,
                            name="norm2")(x + h).astype(p.compute_dtype)


# --------------- faithful VLPT encoders ---------------


class VLPTAttention(nn.Module):
    """encoders.py:84 Attention: separate q/k/v projections, key mask."""

    dim: int
    heads: int
    qkv_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, query, memory, mask: Optional[jnp.ndarray] = None):
        p = self.policy
        d = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype)
        hd = self.dim // self.heads
        B, N1, _ = query.shape
        N2 = memory.shape[1]
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, **d,
                     name="q_proj")(query).reshape(B, N1, self.heads, hd)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, **d,
                     name="k_proj")(memory).reshape(B, N2, self.heads, hd)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, **d,
                     name="v_proj")(memory).reshape(B, N2, self.heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
        if mask is not None:
            s = jnp.where(mask[:, None, None, :] > 0, s, -jnp.inf)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, N1, self.dim)
        return nn.Dense(self.dim, **d, name="proj")(o)


class VLPTMlp(nn.Module):
    dim: int
    hidden: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        d = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype)
        x = _gelu(nn.Dense(self.hidden, **d, name="fc1")(x))
        return nn.Dense(self.dim, **d, name="fc2")(x)


class VLPTBlock(nn.Module):
    """encoders.py:140 Block — pre-norm self-attention + MLP."""

    cfg: VLPTConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None):
        cfg, p = self.cfg, self.policy
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm1")(
            x).astype(p.compute_dtype)
        x = x + VLPTAttention(cfg.embed_dim, cfg.heads, cfg.qkv_bias,
                              policy=p, name="attn")(h, h, mask)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm2")(
            x).astype(p.compute_dtype)
        return x + VLPTMlp(cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio),
                           policy=p, name="mlp")(h)


class VLPTCrossBlock(nn.Module):
    """encoders.py:170 Cross_Block — masked self-attn on norm1, cross-attn
    with norm2 on BOTH query and memory, MLP on norm3."""

    cfg: VLPTConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, memory, mask=None):
        cfg, p = self.cfg, self.policy
        n1 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                          param_dtype=p.param_dtype, name="norm1")
        n2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                          param_dtype=p.param_dtype, name="norm2")
        h = n1(x).astype(p.compute_dtype)
        x = x + VLPTAttention(cfg.embed_dim, cfg.heads, cfg.qkv_bias,
                              policy=p, name="self_attn")(h, h, mask)
        xq = n2(x).astype(p.compute_dtype)
        mk = n2(memory).astype(p.compute_dtype)
        x = x + VLPTAttention(cfg.embed_dim, cfg.heads, cfg.qkv_bias,
                              policy=p, name="cross_attn")(xq, mk)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm3")(
            x).astype(p.compute_dtype)
        return x + VLPTMlp(cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio),
                           policy=p, name="mlp")(h)


class Bottleneck(nn.Module):
    """torchvision ResNet Bottleneck v1.5 (stride on conv2)."""

    planes: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy

        def conv(feat, k, s, name):
            pad = (k - 1) // 2
            return nn.Conv(feat, (k, k), (s, s), padding=[(pad, pad)] * 2,
                           use_bias=False, dtype=p.compute_dtype,
                           param_dtype=p.param_dtype, name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=BN_MOMENTUM, dtype=jnp.float32,
                                param_dtype=p.param_dtype, name=name)

        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x))
                      .astype(p.compute_dtype))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out))
                      .astype(p.compute_dtype))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out))
        out = out.astype(p.compute_dtype)
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            x = bn("downsample_bn")(
                conv(self.planes * 4, 1, self.stride, "downsample_conv")(x))
            x = x.astype(p.compute_dtype)
        return nn.relu(out + x)


class ResNet50Backbone(nn.Module):
    """torchvision resnet50 trunk → (c2, c3, c4, c5)."""

    base: int = 64
    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        x = nn.Conv(self.base, (7, 7), (2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=p.compute_dtype,
                    param_dtype=p.param_dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="bn1")(x)
        x = nn.relu(x.astype(p.compute_dtype))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for li, n in enumerate(self.blocks):
            planes = self.base * (2 ** li)
            for b in range(n):
                stride = 2 if (b == 0 and li > 0) else 1
                x = Bottleneck(planes, stride, policy=p,
                               name=f"layer{li + 1}_{b}")(x, train)
            feats.append(x)
        return feats                      # strides 4, 8, 16, 32


class VLPTFPN(nn.Module):
    """encoders.py:20 FPN — 1x1 laterals (no bias), nearest top-down sums,
    every level resized to c3 resolution and channel-concatenated."""

    ndim: int = 256
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, feats):
        p = self.policy
        c2, c3, c4, c5 = feats
        lat = [nn.Conv(self.ndim, (1, 1), use_bias=False,
                       dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       name=f"fpn_in_{i}") for i in range(4)]
        p5 = lat[0](c5)
        up = jax.image.resize(p5, (p5.shape[0], c4.shape[1], c4.shape[2],
                                   self.ndim), "nearest")
        p4 = lat[1](c4) + up
        up = jax.image.resize(p4, (p4.shape[0], c3.shape[1], c3.shape[2],
                                   self.ndim), "nearest")
        p3 = lat[2](c3) + up
        up = jax.image.resize(p3, (p3.shape[0], c2.shape[1], c2.shape[2],
                                   self.ndim), "nearest")
        p2 = lat[3](c2) + up
        tgt = (p3.shape[0], c3.shape[1], c3.shape[2], self.ndim)
        # antialias=False: torch F.interpolate(bilinear) does not low-pass
        # downscales; jax.image.resize does by default
        p2 = jax.image.resize(p2, tgt, "bilinear", antialias=False)
        p4 = jax.image.resize(p4, tgt, "bilinear", antialias=False)
        p5 = jax.image.resize(p5, tgt, "bilinear", antialias=False)
        return jnp.concatenate([p2, p3, p4, p5], axis=-1)


class VLPTImageEncoder(nn.Module):
    cfg: VLPTConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg, p = self.cfg, self.policy
        feats = ResNet50Backbone(cfg.resnet_base, cfg.resnet_blocks,
                                 policy=p, name="backbone")(
            images.astype(p.compute_dtype), train)
        x = VLPTFPN(cfg.fpn_dim, policy=p, name="fpn")(feats)
        x = nn.Conv(cfg.embed_dim, (1, 1), (2, 2), dtype=p.compute_dtype,
                    param_dtype=p.param_dtype, name="proj")(x)   # stride 16
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, cfg.embed_dim), p.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, C)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, H * W + 1, cfg.embed_dim), p.param_dtype)
        x = x + pos.astype(x.dtype)
        for i in range(cfg.image_depth):
            x = VLPTBlock(cfg, policy=p, name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            param_dtype=p.param_dtype, name="norm")(
            x).astype(p.compute_dtype)


class VLPTTextEncoder(nn.Module):
    cfg: VLPTConfig
    word_embed: nn.Module = None     # shared with the tied MLM decoder
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, ids, mask, train: bool = False):
        cfg, p = self.cfg, self.policy
        T = ids.shape[1]
        emb = self.word_embed(ids)
        emb = emb + nn.Embed(cfg.max_text_len, cfg.embed_dim,
                             param_dtype=p.param_dtype,
                             name="position_embeddings")(jnp.arange(T))[None]
        emb = emb + nn.Embed(2, cfg.embed_dim, param_dtype=p.param_dtype,
                             name="token_type_embeddings")(
            jnp.zeros_like(ids))
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="emb_norm")(
            emb).astype(p.compute_dtype)
        for i in range(cfg.text_depth):
            x = VLPTBlock(cfg, policy=p, name=f"block_{i}")(x, mask)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            param_dtype=p.param_dtype, name="norm")(
            x).astype(p.compute_dtype)


@MODELS.register("vlpt_std")
class VLPT(nn.Module):
    config: VLPTConfig = VLPTConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        p = self.policy
        self.image_encoder = VLPTImageEncoder(cfg, policy=p)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                                        param_dtype=p.param_dtype)
        self.text_encoder = VLPTTextEncoder(cfg, word_embed=self.word_embeddings,
                                            policy=p)
        self.co_blocks = [VLPTCrossBlock(cfg, policy=p, name=f"co_block_{i}")
                          for i in range(cfg.co_depth)]
        self.co_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                    param_dtype=p.param_dtype)
        self.token_type = nn.Embed(2, cfg.embed_dim, param_dtype=p.param_dtype)
        d = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype)
        self.image_proj = nn.Dense(cfg.embed_dim, **d)
        self.text_proj = nn.Dense(cfg.embed_dim, **d)
        self.image_proj_wip = nn.Dense(cfg.embed_dim, **d)
        self.text_proj_wip = nn.Dense(cfg.embed_dim, **d)
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(math.log(1 / 0.07)),
                                      (), jnp.float32)
        self.logit_scale_wip = self.param("logit_scale_wip",
                                          nn.initializers.constant(math.log(1 / 0.07)),
                                          (), jnp.float32)
        self.mlm_dense = nn.Dense(cfg.embed_dim, **d)
        self.mlm_norm = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                                     param_dtype=p.param_dtype)
        self.mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                                   (cfg.vocab_size,), p.param_dtype)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """batch: image [B,H,W,3], text_ids [B,T] (un-masked), text_ids_mlm
        [B,T], text_labels_mlm [B,T] (-100 = not masked), text_masks [B,T]."""
        cfg = self.config
        text = self.text_encoder(batch["text_ids_mlm"], batch["text_masks"],
                                 train)
        image = self.image_encoder(batch["image"], train)

        text = text + self.token_type(jnp.zeros((), jnp.int32))[None, None].astype(text.dtype)
        image = image + self.token_type(jnp.ones((), jnp.int32))[None, None].astype(image.dtype)

        # ---- word-in-image hard mining (VLPT.py:80) ----
        # (the reference's in-place `detach()/norm` quirk also normalizes
        # the live embedding table; here the normalized copy is used only
        # for the similarity search)
        word_table = self.word_embeddings.embedding
        table = jax.lax.stop_gradient(word_table)
        table = table / (jnp.linalg.norm(table, axis=-1, keepdims=True) + 1e-8)
        tok_emb = table[batch["text_ids"]]                         # [B,T,C]
        sim = jnp.einsum("btc,vc->btv", tok_emb, table)
        _, cand_ids = jax.lax.top_k(sim, cfg.false_text_length)    # [B,T,K]
        cand_emb = word_table[cand_ids]

        lens = jnp.sum(batch["text_masks"], axis=1)
        pos = jnp.arange(batch["text_ids"].shape[1])[None]
        valid = (batch["text_masks"] > 0) & (pos != 0) & \
            (pos != (lens - 1)[:, None]) & (batch["text_labels_mlm"] == -100)

        img_wip = self.image_proj_wip(image[:, 1:2])
        txt_wip = self.text_proj_wip(cand_emb.astype(img_wip.dtype))
        img_wip = img_wip / (jnp.linalg.norm(img_wip, axis=-1, keepdims=True) + 1e-8)
        txt_wip = txt_wip / (jnp.linalg.norm(txt_wip, axis=-1, keepdims=True) + 1e-8)
        scale_wip = jnp.exp(jnp.clip(self.logit_scale_wip, 0, math.log(100)))
        wip_logits = scale_wip * jnp.einsum("bqc,btkc->btk", img_wip, txt_wip)

        # ---- global contrast features ----
        tfeat = self.text_proj(text[:, 0])
        ifeat = self.image_proj(image[:, 0])
        tfeat = tfeat / (jnp.linalg.norm(tfeat, axis=-1, keepdims=True) + 1e-8)
        ifeat = ifeat / (jnp.linalg.norm(ifeat, axis=-1, keepdims=True) + 1e-8)
        scale = jnp.exp(jnp.clip(self.logit_scale, 0, math.log(100)))

        # ---- co-encoder (text queries, image memory) + MLM ----
        co = text
        for blk in self.co_blocks:
            co = blk(co, image, batch["text_masks"])
        co = self.co_norm(co).astype(self.policy.compute_dtype)
        h = self.mlm_dense(co)
        h = _gelu(h)
        h = self.mlm_norm(h).astype(self.policy.compute_dtype)
        mlm_logits = (jnp.einsum("btc,vc->btv", h,
                                 word_table.astype(h.dtype))
                      + self.mlm_bias.astype(h.dtype)).astype(jnp.float32)

        return {"mlm_logits": mlm_logits, "image_feats": ifeat,
                "text_feats": tfeat, "logit_scale": scale,
                "wip_logits": wip_logits.astype(jnp.float32),
                "wip_valid": valid}


def vlpt_losses(out: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
                ) -> Dict[str, jnp.ndarray]:
    """3-loss pretraining objective (losses.py:9/26/65, weighted sum as in
    main.py). Under pjit the batch is logically global, so the contrastive
    pairing needs no explicit all_gather (the reference's dist.all_gather
    is the NCCL equivalent)."""
    labels = batch["text_labels_mlm"]
    valid = (labels != -100)
    logp = jax.nn.log_softmax(out["mlm_logits"], -1)
    nll = -jnp.take_along_axis(logp, jnp.where(valid, labels, 0)[..., None],
                               -1)[..., 0]
    mlm = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    logits_i = out["logit_scale"] * out["image_feats"] @ out["text_feats"].T
    B = logits_i.shape[0]
    diag = jnp.arange(B)
    img_loss = -jnp.mean(jax.nn.log_softmax(logits_i, -1)[diag, diag])
    txt_loss = -jnp.mean(jax.nn.log_softmax(logits_i.T, -1)[diag, diag])
    contrast = 0.5 * img_loss + 0.5 * txt_loss

    # WIP: true subword is slot 0 of the candidate list
    wip_logp = jax.nn.log_softmax(out["wip_logits"], -1)[..., 0]
    wv = out["wip_valid"]
    wip = -jnp.sum(wip_logp * wv) / jnp.maximum(jnp.sum(wv), 1)

    total = mlm + contrast + wip
    return {"loss": total, "mlm_loss": mlm, "contrast_loss": contrast,
            "wip_loss": wip}

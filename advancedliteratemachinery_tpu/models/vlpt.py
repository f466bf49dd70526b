"""VLPT-STD: vision-language pre-training for scene-text detection.

Behavioral parity target (reference OCR/VLPT-STD):
- VLPT model (models/VLPT.py:29): image encoder (ResNet+FPN → token
  sequence with a leading global token), BERT-style text encoder, token-
  type embeddings, CLIP-style projections with clamped logit scales
  (:101,112), co-encoder + MLM head (:14).
- Losses (models/losses.py): MLM CE ignore -100 (:9); two-way image-text
  contrastive (:26) — the reference all_gathers features across NCCL ranks;
  under pjit the batch is logically global so the same math needs no
  explicit collective; word-in-image global-local contrast with online
  hard-subword mining (VLPT.py:80: top-K nearest subword embeddings as
  negatives, true token at slot 0, specials/masked positions ignored).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import gelu as _gelu, Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.db import ConvBNRelu, ResBlock


@dataclasses.dataclass(frozen=True)
class VLPTConfig(ConfigBase):
    embed_dim: int = 256
    vocab_size: int = 30522
    max_text_len: int = 64
    text_layers: int = 6
    co_layers: int = 3
    heads: int = 8
    resnet_width: int = 32
    false_text_length: int = 64


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


@MODELS.register("vlpt_std")
class VLPT(nn.Module):
    config: VLPTConfig = VLPTConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        p = self.policy
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                                        param_dtype=p.param_dtype)
        self.pos_embeddings = nn.Embed(cfg.max_text_len, cfg.embed_dim,
                                       param_dtype=p.param_dtype)
        self.emb_norm = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                                     param_dtype=p.param_dtype)
        self.text_layers_mods = [
            TransformerEncoderLayer(cfg.embed_dim, cfg.heads, policy=p,
                                    name=f"text_layer_{i}")
            for i in range(cfg.text_layers)]
        self.co_layers_mods = [
            TransformerEncoderLayer(cfg.embed_dim, cfg.heads, policy=p,
                                    name=f"co_layer_{i}")
            for i in range(cfg.co_layers)]
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
        self.img_cls = self.param("img_cls", nn.initializers.truncated_normal(0.02),
                                  (1, 1, cfg.embed_dim), p.param_dtype)
        # image trunk (ResNet blocks, stride 32) + proj to embed_dim
        self._img_stem = ConvBNRelu(cfg.resnet_width, (7, 7), (2, 2), policy=p,
                                    name="img_stem")
        self._img_blocks = [
            ResBlock(cfg.resnet_width * (2 ** min(i, 3)), 2, policy=p,
                     name=f"img_block_{i}") for i in range(4)]
        self.img_out = nn.Dense(cfg.embed_dim, **d)

    def encode_text(self, ids, mask, train=False):
        T = ids.shape[1]
        emb = self.word_embeddings(ids) + self.pos_embeddings(jnp.arange(T))[None]
        x = self.emb_norm(emb).astype(self.policy.compute_dtype)
        for layer in self.text_layers_mods:
            x = layer(x, mask)
        return x

    def encode_image(self, images, train=False):
        x = self._img_stem(images.astype(self.policy.compute_dtype), train)
        for blk in self._img_blocks:
            x = blk(x, train)
        B, H, W, C = x.shape
        tokens = self.img_out(x.reshape(B, H * W, C))
        cls = jnp.broadcast_to(self.img_cls.astype(tokens.dtype),
                               (B, 1, tokens.shape[-1]))
        return jnp.concatenate([cls, tokens], axis=1)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """batch: image [B,H,W,3], text_ids [B,T] (un-masked), text_ids_mlm
        [B,T], text_labels_mlm [B,T] (-100 = not masked), text_masks [B,T]."""
        cfg = self.config
        text = self.encode_text(batch["text_ids_mlm"], batch["text_masks"], train)
        image = self.encode_image(batch["image"], train)

        text = text + self.token_type(jnp.zeros((), jnp.int32))[None, None].astype(text.dtype)
        image = image + self.token_type(jnp.ones((), jnp.int32))[None, None].astype(image.dtype)

        # ---- word-in-image hard mining (VLPT.py:80) ----
        table = jax.lax.stop_gradient(self.word_embeddings.embedding)
        table = table / (jnp.linalg.norm(table, axis=-1, keepdims=True) + 1e-8)
        tok_emb = table[batch["text_ids"]]                         # [B,T,C]
        sim = jnp.einsum("btc,vc->btv", tok_emb, table)
        _, cand_ids = jax.lax.top_k(sim, cfg.false_text_length)    # [B,T,K]
        cand_emb = self.word_embeddings.embedding[cand_ids]

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

        # ---- co-encoder + MLM ----
        co = jnp.concatenate([text, image], axis=1)
        img_mask = jnp.ones(image.shape[:2], batch["text_masks"].dtype)
        co_mask = jnp.concatenate([batch["text_masks"], img_mask], axis=1)
        for layer in self.co_layers_mods:
            co = layer(co, co_mask)
        h = self.mlm_dense(co[:, : text.shape[1]])
        h = _gelu(h)
        h = self.mlm_norm(h).astype(self.policy.compute_dtype)
        mlm_logits = (jnp.einsum("btc,vc->btv", h,
                                 self.word_embeddings.embedding.astype(h.dtype))
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

"""GeoLayoutLM: visual information extraction (SER + RE), TPU-native.

Behavioral parity target (reference DocumentUnderstanding/GeoLayoutLM):
- GeoLayoutLMModel (bros/modeling_bros_convnext.py:29): BROS text encoder ⊕
  ConvNeXt-tiny + DB-style FPN vision (bros/vision_model.py:16, feat_ms
  256ch at stride 4), per-block ROI features at the blocks' first-token
  boxes (roi_align 1x1, :128), one cross-modal decoder layer per direction
  (:43-53), outputs (sequence, block-vis, text-mm, vis-mm).
- VIE heads (model/geolayoutlm_vie.py:22): BIO token classifier (optionally
  concatenated with line-rank-inner embeddings, :38/:134), PairGeometricHead
  (bilinear block-pair logits, modeling_bros_convnext.py:205),
  MultiPairsGeometricHead (:260 — pair features, encoder over confident
  pairs, decoder refinement; the data-dependent top-K is a static-size
  top-k + mask here).
- Losses (:186 _get_loss): CE(ignore -100) for labeling; masked BCE over
  both linking-logit stages.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.bros import BrosConfig, BrosTextEncoder
from advancedliteratemachinery_tpu.models.convnext import ConvNeXt, ConvNeXtConfig


@dataclasses.dataclass(frozen=True)
class GeoLayoutLMConfig(ConfigBase):
    bros: BrosConfig = BrosConfig()
    convnext: ConvNeXtConfig = ConvNeXtConfig()
    n_classes: int = 7
    use_inner_id: bool = True
    vis_channels: int = 256
    max_rel_enc: int = 96
    image_size: int = 896


class VisionFPN(nn.Module):
    """ConvNeXt + DB-style FPN → feat_ms [B, H/4, W/4, 256]
    (vision_model.py:16)."""

    cfg: GeoLayoutLMConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        p = self.policy
        c = self.cfg.vis_channels
        # reference normalizes with ImageNet stats from 0-255 input
        mean = jnp.asarray([0.485, 0.456, 0.406]) * 255.0
        std = jnp.asarray([0.229, 0.224, 0.225]) * 255.0
        x = (images - mean) / std
        c2, c3, c4, c5 = ConvNeXt(self.cfg.convnext, policy=p,
                                  name="cnn")(x, deterministic)
        lat = {}
        for name, f in (("in5", c5), ("in4", c4), ("in3", c3), ("in2", c2)):
            lat[name] = nn.Conv(c, (1, 1), use_bias=False, dtype=p.compute_dtype,
                                param_dtype=p.param_dtype, name=name)(f)
        # learned position embedding on the top level + aggregation conv
        pos = self.param("pos_emb1", nn.initializers.truncated_normal(0.02),
                         (1, lat["in5"].shape[1], lat["in5"].shape[2], c),
                         p.param_dtype)
        in5 = lat["in5"] + pos.astype(lat["in5"].dtype)
        in5 = nn.Conv(c, (3, 3), padding="SAME", dtype=p.compute_dtype,
                      param_dtype=p.param_dtype, name="aggr")(in5)

        def up2(x, ref):
            return jax.image.resize(x, (x.shape[0], ref.shape[1], ref.shape[2],
                                        x.shape[-1]), "nearest")

        out4 = up2(in5, lat["in4"]) + lat["in4"]
        out3 = up2(out4, lat["in3"]) + lat["in3"]
        out2 = up2(out3, lat["in2"]) + lat["in2"]

        def head(x, name, factor):
            h = nn.Conv(c // 4, (3, 3), padding="SAME", use_bias=False,
                        dtype=p.compute_dtype, param_dtype=p.param_dtype,
                        name=name)(x)
            if factor > 1:
                h = jax.image.resize(h, (h.shape[0], h.shape[1] * factor,
                                         h.shape[2] * factor, c // 4), "nearest")
            return h

        feat = jnp.concatenate([
            head(in5, "out5", 8), head(out4, "out4", 4),
            head(out3, "out3", 2), head(out2, "out2", 1)], axis=-1)
        return feat  # [B, H/4, W/4, 256]


def roi_block_feature(feat: jnp.ndarray, boxes: jnp.ndarray,
                      coord_scale: float = 1000.0) -> jnp.ndarray:
    """1x1 RoIAlign per block box — exact torchvision semantics
    (reference modeling_bros_convnext.py:126-133: roi_align(feat, rois, 1,
    spatial_scale=W_f/1000), adaptive sampling_ratio=-1, aligned=False).
    feat [B,Hf,Wf,C]; boxes [B,N,4] in 0..coord_scale → [B,N,C]."""
    from advancedliteratemachinery_tpu.ops.roi_align import roi_align

    B, Hf, Wf, C = feat.shape
    out = roi_align(feat.astype(jnp.float32), boxes, out_hw=(1, 1),
                    spatial_scale=Wf / coord_scale)
    return out.reshape(B, boxes.shape[1], C).astype(feat.dtype)


class CrossModalLayer(nn.Module):
    """One torch TransformerDecoderLayer (post-norm, optional self-attn)."""

    dim: int
    heads: int
    ffn: int
    self_attn: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask, mem_mask):
        p = self.policy
        B, T, D = tgt.shape
        hd = D // self.heads

        def mha(q_in, kv_in, kv_mask, name):
            q = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"{name}_q")(q_in).reshape(B, -1, self.heads, hd)
            k = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"{name}_k")(kv_in).reshape(B, -1, self.heads, hd)
            v = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"{name}_v")(kv_in).reshape(B, -1, self.heads, hd)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
            s = jnp.where(kv_mask[:, None, None, :] > 0, s, -1e9)
            a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, -1, D)
            return nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                            name=f"{name}_out")(o)

        if self.self_attn:
            h = mha(tgt, tgt, tgt_mask, "sa")
            tgt = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                               name="norm1")(tgt + h).astype(p.compute_dtype)
        h = mha(tgt, memory, mem_mask, "ca")
        tgt = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                           name="norm2")(tgt + h).astype(p.compute_dtype)
        h = nn.Dense(self.ffn, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff1")(tgt)
        h = nn.relu(h)
        h = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff2")(h)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                            name="norm3")(tgt + h).astype(p.compute_dtype)


class SelfEncoderLayer(nn.Module):
    """Stock torch nn.TransformerEncoderLayer semantics (post-norm, relu):
    one self-attention + FFN with norm1/norm2 — the reference's
    MultiPairsGeometricHead trenc (modeling_bros_convnext.py:266)."""

    dim: int
    heads: int
    ffn: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask):
        p = self.policy
        B, T, D = x.shape
        hd = D // self.heads
        q = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="sa_q")(x).reshape(B, T, self.heads, hd)
        k = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="sa_k")(x).reshape(B, T, self.heads, hd)
        v = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="sa_v")(x).reshape(B, T, self.heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        s = jnp.where(mask[:, None, None, :] > 0, s, -1e9)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, T, D)
        o = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="sa_out")(o)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm1")(x + o).astype(p.compute_dtype)
        h = nn.Dense(self.ffn, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff1")(x)
        h = nn.relu(h)
        h = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff2")(h)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                            name="norm2")(x + h).astype(p.compute_dtype)


@MODELS.register("geolayoutlm")
class GeoLayoutLM(nn.Module):
    config: GeoLayoutLMConfig = GeoLayoutLMConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        """batch: image [B,H,W,3] (0..255), input_ids [B,S],
        bbox_4p_normalized [B,S,8], attention_mask [B,S], bbox [B,S,4]
        (ints 0..1000), first_token_idxes [B,N], block_mask [B,N],
        line_rank_id [B,S], line_rank_inner_id [B,S]."""
        cfg = self.config
        p = self.policy
        B, S = batch["input_ids"].shape

        seq, _ = BrosTextEncoder(cfg.bros, policy=p, name="text_encoder")(
            batch["input_ids"], batch["bbox_4p_normalized"],
            batch["attention_mask"], line_bbox=batch.get("bbox"),
            line_rank_id=batch.get("line_rank_id"),
            line_rank_inner_id=batch.get("line_rank_inner_id"),
            deterministic=deterministic)

        feat_ms = VisionFPN(cfg, policy=p, name="visual_encoder")(
            batch["image"], deterministic)

        fti = batch["first_token_idxes"]                 # [B, N]
        block_mask = batch["block_mask"].astype(jnp.float32)
        blk_bbox = jnp.take_along_axis(
            batch["bbox"], fti[..., None].astype(jnp.int32), axis=1)  # [B,N,4]
        blk_vis = roi_block_feature(feat_ms, blk_bbox.astype(jnp.float32))
        blk_vis = nn.Dense(cfg.bros.hidden_size, dtype=p.compute_dtype,
                           param_dtype=p.param_dtype, name="vis_linear")(blk_vis)
        blk_vis = blk_vis * block_mask[..., None].astype(blk_vis.dtype)

        full_img = jnp.mean(feat_ms, axis=(1, 2))
        full_img = nn.Dense(cfg.bros.hidden_size, dtype=p.compute_dtype,
                            param_dtype=p.param_dtype, name="vis_linear_full")(
            full_img)[:, None]
        vis_inps = jnp.concatenate([full_img, blk_vis], axis=1)
        vis_mask = jnp.concatenate(
            [jnp.ones((B, 1)), block_mask], axis=1)

        text_mm = CrossModalLayer(cfg.bros.hidden_size,
                                  cfg.bros.num_attention_heads,
                                  cfg.bros.intermediate_size, policy=p,
                                  name="cross_modal_text")(
            seq, vis_inps, batch["attention_mask"], vis_mask)
        vis_mm = CrossModalLayer(cfg.bros.hidden_size,
                                 cfg.bros.num_attention_heads,
                                 cfg.bros.intermediate_size, policy=p,
                                 name="cross_modal_visual")(
            vis_inps, seq, vis_mask, batch["attention_mask"])

        # ----- SER head -----
        ser_in = text_mm
        if cfg.use_inner_id and "line_rank_inner_id" in batch:
            inner = nn.Embed(4, cfg.bros.hidden_size, param_dtype=p.param_dtype,
                             name="bio_inner_embeddings")(
                batch["line_rank_inner_id"])
            ser_in = jnp.concatenate([text_mm, inner.astype(text_mm.dtype)], -1)
        logits4labeling = nn.Dense(cfg.n_classes, dtype=p.compute_dtype,
                                   param_dtype=p.param_dtype,
                                   name="bio_classifier")(ser_in).astype(jnp.float32)

        # ----- RE heads -----
        text_blk = jnp.take_along_axis(text_mm, fti[..., None].astype(jnp.int32),
                                       axis=1)
        text_blk = text_blk * block_mask[..., None].astype(text_blk.dtype)
        mixed = vis_mm[:, 1:] + text_blk                 # [B, N, D]

        # PairGeometricHead: bilinear
        D = cfg.bros.hidden_size
        W = self.param("pair_bilinear", nn.initializers.xavier_normal(),
                       (D, D), p.param_dtype)
        pair_b = self.param("pair_bias", nn.initializers.zeros, (),
                            p.param_dtype)
        logits1 = jnp.einsum("bic,cd,bjd->bij", mixed, W.astype(mixed.dtype),
                             mixed) + pair_b.astype(mixed.dtype)
        logits1 = logits1.astype(jnp.float32)

        # MultiPairsGeometricHead (static top-K over confident pairs)
        N = mixed.shape[1]
        pair_feat = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                             name="rel_layer")(
            jnp.concatenate([
                jnp.broadcast_to(mixed[:, :, None], (B, N, N, D)),
                jnp.broadcast_to(mixed[:, None, :], (B, N, N, D))], -1)
        ).reshape(B, N * N, D)
        pair_mask = (block_mask[:, :, None] * block_mask[:, None, :]).reshape(B, N * N)
        score_prev = jax.nn.sigmoid(jax.lax.stop_gradient(logits1)).reshape(B, N * N)
        conf = jnp.where(pair_mask > 0, score_prev, 0.0)
        K = min(cfg.max_rel_enc, N * N)
        topv, topi = jax.lax.top_k(conf, K)
        pos_valid = (topv >= 0.5)
        pos_valid = pos_valid.at[:, 0].set(True)
        pos_pairs = jnp.take_along_axis(pair_feat, topi[..., None], axis=1)
        pos_pairs = pos_pairs * pos_valid[..., None].astype(pos_pairs.dtype)

        # encoder over confident patterns (stock TransformerEncoderLayer)
        patterns = SelfEncoderLayer(D, 2, D, policy=p, name="mp_enc")(
            pos_pairs, pos_valid.astype(jnp.float32))
        dec = CrossModalLayer(D, 2, D, self_attn=False, policy=p, name="mp_dec")
        refined = dec(pair_feat, patterns, pair_mask,
                      pos_valid.astype(jnp.float32))
        logits2 = nn.Dense(1, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                           name="mp_fc")(refined).reshape(B, N, N).astype(jnp.float32)

        return {
            "logits4labeling": logits4labeling,
            "logits4linking_list": [logits1, logits2],
            "pred4linking": (jax.nn.sigmoid(logits2) >= 0.5).astype(jnp.float32),
            "text_mm": text_mm, "vis_mm": vis_mm, "mixed_blk": mixed,
        }


def geolayoutlm_losses(out: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
                       ) -> Dict[str, jnp.ndarray]:
    """CE(ignore -100) labeling + masked BCE linking over both stages
    (geolayoutlm_vie.py:186)."""
    logits = out["logits4labeling"]
    labels = batch["bio_labels"]
    valid = (labels != -100).astype(jnp.float32)
    safe = jnp.where(labels == -100, 0, labels)
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
    labeling = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    link_labels = batch["el_labels_blk"].astype(jnp.float32)
    link_mask = batch["el_label_blk_mask"].astype(jnp.float32)
    linking = 0.0
    for lg in out["logits4linking_list"]:
        bce = jnp.maximum(lg, 0) - lg * link_labels + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        linking = linking + jnp.sum(bce * link_mask) / jnp.maximum(
            jnp.sum(link_mask), 1.0)

    return {"loss": labeling + linking, "labeling_loss": labeling,
            "linking_loss": linking}

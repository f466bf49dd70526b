"""LevOCR: scene-text recognition as iterative Levenshtein refinement.

Behavioral parity target (reference: OCR/LevOCR):
- ABINet vision branch predicts initial text + a feature map
  (models.py:145 LevOCRModel; image feature extractor :160 — two convs
  (2x2 s(2,1) p(0,1); 2x2 s1 p0) over the 8x32x512 map → 96 image tokens).
- LevT (levt/levenshtein_transformer.py): a text-only "encoder" stack
  (:387, BERT-style embeddings + 6 self-attn layers over tokens) and a
  multimodal "decoder" stack (:540, text features + learned positions +
  type-0 embedding ⊕ projected image tokens + positions + type-1, 6
  self-attn layers) with three heads: mask-ins (paired-feature linear →
  256 counts, :622), word-ins (tied output projection, :639), word-del
  (binary, :653).
- Training (forward :156): noised target (random_delete, models.py:63) →
  insertion supervision; masked-target word-ins; online word predictions →
  deletion supervision; losses with label smoothing (mask_ins ls 0.01,
  word_ins ls 0.1) (models.py:17 _compute_levt_loss).
- Eval (forward_decoder :245 + eval.py:139 generate): max_iter+1 rounds of
  delete (p(del) > th=0.5) → insert placeholders → fill words, starting
  from the vision branch's prediction.

TPU-first: the refinement loop runs over fixed [B, L] buffers with masked
edit ops (ops/levenshtein.py) — no reallocation, one compiled graph; the
fairseq dictionary conventions (bos 0, pad 1, eos 2, unk 3) are kept for
checkpoint parity.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import CODECS, MODELS
from advancedliteratemachinery_tpu.models.abinet import (
    ABINetVision,
    ABINetVisionConfig,
    ConvBN,
)
from advancedliteratemachinery_tpu.ops.levenshtein import (
    apply_del_words,
    apply_ins_masks,
    apply_ins_words,
)

BOS, PAD, EOS, UNK = 0, 1, 2, 3  # fairseq Dictionary order


@CODECS.register("levt_dict")
class LevtDictionary:
    """fairseq-convention dictionary over a charset (levt/dictionary.py)."""

    def __init__(self, charset: str = "abcdefghijklmnopqrstuvwxyz0123456789",
                 max_len: int = 28):
        self.itos = ["<s>", "<pad>", "</s>", "<unk>"] + list(charset)
        self.stoi = {c: i for i, c in enumerate(self.itos)}
        self.max_len = max_len  # includes bos/eos

    def __len__(self):
        return len(self.itos)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_len), PAD, np.int32)
        for i, t in enumerate(texts):
            seq = [BOS] + [self.stoi.get(c, UNK) for c in t][: self.max_len - 2] + [EOS]
            out[i, : len(seq)] = seq
        return out

    def decode(self, ids: np.ndarray) -> List[str]:
        texts = []
        for row in np.asarray(ids):
            chars = []
            for i in row:
                i = int(i)
                if i == EOS:
                    break
                if i in (BOS, PAD, UNK):
                    continue
                chars.append(self.itos[i])
            texts.append("".join(chars))
        return texts


@dataclasses.dataclass(frozen=True)
class LevOCRConfig(ConfigBase):
    charset: str = "abcdefghijklmnopqrstuvwxyz0123456789"
    max_len: int = 28             # bos + 26 + eos (embed_len_text)
    d_model: int = 512
    heads: int = 8
    ffn: int = 2048
    layers: int = 6               # decoder_layers (utils.py:165)
    max_ins: int = 255
    max_iter: int = 2             # utils.py:187
    del_threshold: float = 0.5    # utils.py:189 --th
    label_smoothing: float = 0.1
    vision: ABINetVisionConfig = ABINetVisionConfig()

    @property
    def vocab_size(self) -> int:
        return 4 + len(self.charset)


class PostNormSelfAttnLayer(nn.Module):
    """fairseq TransformerDecoderLayer with no cross-attn, post-norm."""

    dim: int
    heads: int
    ffn: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, pad_mask=None):
        p = self.policy
        B, T, C = x.shape
        hd = C // self.heads
        q = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype, name="q")(x)
        k = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype, name="k")(x)
        v = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype, name="v")(x)
        q = q.reshape(B, T, self.heads, hd)
        k = k.reshape(B, T, self.heads, hd)
        v = v.reshape(B, T, self.heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        if pad_mask is not None:  # pad_mask: True where PADDED
            s = jnp.where(pad_mask[:, None, None, :], -1e9, s)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, T, C)
        o = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="out")(o)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm1")(x + o).astype(p.compute_dtype)
        h = nn.Dense(self.ffn, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff1")(x)
        h = nn.relu(h)
        h = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff2")(h)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                            name="norm2")(x + h).astype(p.compute_dtype)


class LevtTextEncoder(nn.Module):
    """Token stack: BERT-style embeddings + N self-attn layers
    (levenshtein_transformer.py:387 LevenshteinTransformerEncoder)."""

    cfg: LevOCRConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, tokens):
        cfg = self.cfg
        p = self.policy
        emb = nn.Embed(cfg.vocab_size, cfg.d_model, param_dtype=p.param_dtype,
                       name="word_emb")(tokens)
        pos = nn.Embed(cfg.max_len, cfg.d_model, param_dtype=p.param_dtype,
                       name="pos_emb")(jnp.arange(tokens.shape[1])[None])
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="emb_ln")(emb + pos).astype(p.compute_dtype)
        pad_mask = tokens == PAD
        for i in range(cfg.layers):
            x = PostNormSelfAttnLayer(cfg.d_model, cfg.heads, cfg.ffn, policy=p,
                                      name=f"layer_{i}")(x, pad_mask)
        return x


class LevtFusionDecoder(nn.Module):
    """Multimodal stack + 3 heads (levenshtein_transformer.py:540)."""

    cfg: LevOCRConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.cfg
        p = self.policy
        self.word_emb_out = nn.Embed(cfg.vocab_size, cfg.d_model,
                                     param_dtype=p.param_dtype)  # tied out proj
        self.mask_ins_emb = nn.Embed(256, cfg.d_model * 2, param_dtype=p.param_dtype)
        self.word_del_emb = nn.Embed(2, cfg.d_model, param_dtype=p.param_dtype)
        self.type_emb = nn.Embed(2, cfg.d_model, param_dtype=p.param_dtype)
        self.img_proj = nn.Dense(cfg.d_model, use_bias=False, dtype=p.compute_dtype,
                                 param_dtype=p.param_dtype)
        self.text_pos = self.param("text_pos", nn.initializers.truncated_normal(0.02),
                                   (1, cfg.max_len, cfg.d_model), p.param_dtype)
        self.img_pos = self.param("img_pos", nn.initializers.truncated_normal(0.02),
                                  (1, 96, cfg.d_model), p.param_dtype)
        self.layers_mods = [
            PostNormSelfAttnLayer(cfg.d_model, cfg.heads, cfg.ffn, policy=p,
                                  name=f"layer_{i}") for i in range(cfg.layers)]

    def fuse(self, text_feature, img_feature):
        p = self.policy
        T = text_feature.shape[1]
        t = (text_feature + self.text_pos[:, :T].astype(text_feature.dtype)
             + self.type_emb(jnp.zeros((1, 1), jnp.int32)).astype(text_feature.dtype))
        if img_feature is not None:
            Ti = img_feature.shape[1]
            im = self.img_proj(img_feature.astype(p.compute_dtype))
            im = (im + self.img_pos[:, :Ti].astype(im.dtype)
                  + self.type_emb(jnp.ones((1, 1), jnp.int32)).astype(im.dtype))
            x = jnp.concatenate([t, im], axis=1)
        else:
            x = t
        for layer in self.layers_mods:
            x = layer(x)
        return x

    def mask_ins(self, text_feature, img_feature):
        feats = self.fuse(text_feature, img_feature)
        T = text_feature.shape[1]
        pair = jnp.concatenate([feats[:, : T - 1], feats[:, 1:T]], axis=-1)
        return jnp.einsum("btc,vc->btv", pair,
                          self.mask_ins_emb.embedding.astype(pair.dtype)
                          ).astype(jnp.float32)

    def word_ins(self, text_feature, img_feature):
        feats = self.fuse(text_feature, img_feature)
        T = text_feature.shape[1]
        return jnp.einsum("btc,vc->btv", feats[:, :T],
                          self.word_emb_out.embedding.astype(feats.dtype)
                          ).astype(jnp.float32)

    def word_del(self, text_feature, img_feature):
        feats = self.fuse(text_feature, img_feature)
        T = text_feature.shape[1]
        return jnp.einsum("btc,vc->btv", feats[:, :T],
                          self.word_del_emb.embedding.astype(feats.dtype)
                          ).astype(jnp.float32)


@MODELS.register("levocr")
class LevOCR(nn.Module):
    config: LevOCRConfig = LevOCRConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        p = self.policy
        self.vision = ABINetVision(cfg.vision, policy=p)
        vdim = cfg.vision.d_model  # 512 in the reference (ResNet45 out)
        self.img_conv1 = ConvBN(vdim, (2, 2), (2, 1), padding=((0, 0), (1, 1)),
                                policy=p)
        self.img_conv2 = ConvBN(vdim, (2, 2), (1, 1), padding=((0, 0), (0, 0)),
                                policy=p)
        self.text_encoder = LevtTextEncoder(cfg, policy=p)
        self.decoder = LevtFusionDecoder(cfg, policy=p)

    def extract_img_feature(self, fmap, train: bool = False):
        """models.py:160: [B,8,32,512] → 2x2 s(2,1) p(0,1) conv then 2x2 s1
        p0 conv → [B, 96, 512] (exact torch padding, so imported checkpoints
        see the same sampling grid)."""
        x = self.img_conv1(fmap, train)       # [B,4,33,512]
        x = self.img_conv2(x, train)          # [B,3,32,512]
        B = x.shape[0]
        return x.reshape(B, -1, x.shape[-1])  # [B, 96, 512]

    def encode_image(self, images, train: bool = False):
        out = self.vision(images, train)
        img_feature = self.extract_img_feature(out["features"], train)
        return out, img_feature

    def __call__(self, images, noised_tokens, masked_tgt_tokens,
                 word_predictions_input=None, train: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        """Training forward (host supplies noised/masked sequences; the
        online word-prediction → deletion-target step is split so the host
        can compute alignment labels between the two passes).

        Returns vision logits + mask_ins/word_ins/word_del logits. When
        word_predictions_input is None the deletion head runs on the noised
        tokens instead, so init() always creates every parameter refine()
        needs (otherwise eval after a default init fails with
        ScopeParamNotFoundError on word_del_emb)."""
        out, img_feature = self.encode_image(images, train)
        res = {"vision_logits": out["logits"]}

        text_feat = self.text_encoder(noised_tokens)
        res["mask_ins_logits"] = self.decoder.mask_ins(text_feat, img_feature)

        text_feat_m = self.text_encoder(masked_tgt_tokens)
        res["word_ins_logits"] = self.decoder.word_ins(text_feat_m, img_feature)

        if word_predictions_input is None:
            word_predictions_input = noised_tokens
        text_feat_w = self.text_encoder(word_predictions_input)
        res["word_del_logits"] = self.decoder.word_del(text_feat_w, img_feature)
        return res

    def text_forward(self, noised_tokens, masked_tgt_tokens,
                     word_predictions_input) -> Dict[str, jnp.ndarray]:
        """Language-branch-only forward (reference
        train_language_dist.py:113: `model(None, text_levt_noise, None,
        tgt_tokens, criterion)` — no image; the LevT heads fuse with
        img_feature=None, so only the text encoder + decoder run)."""
        res = {}
        text_feat = self.text_encoder(noised_tokens)
        res["mask_ins_logits"] = self.decoder.mask_ins(text_feat, None)
        text_feat_m = self.text_encoder(masked_tgt_tokens)
        res["word_ins_logits"] = self.decoder.word_ins(text_feat_m, None)
        text_feat_w = self.text_encoder(word_predictions_input)
        res["word_del_logits"] = self.decoder.word_del(text_feat_w, None)
        return res

    def refine(self, images) -> Dict[str, jnp.ndarray]:
        """Full eval: vision prediction → max_iter+1 rounds of
        delete/insert/fill (forward_decoder, levenshtein_transformer.py:245).
        Returns final tokens [B, L] + vision tokens for comparison."""
        cfg = self.config
        out, img_feature = self.encode_image(images, train=False)

        # vision greedy prediction → levt token layout [bos chars eos pad...]
        vis_ids = jnp.argmax(out["logits"], -1)            # [B, Tv] charset ids
        B, Tv = vis_ids.shape
        L = cfg.max_len
        # charset id 0 is the null/end label in ABINet's charset; levt ids
        # are charset index + 4 (specials), null → eos
        is_null = vis_ids == 0
        first_null = jnp.argmax(is_null, axis=1)
        has_null = jnp.any(is_null, axis=1)
        length = jnp.where(has_null, first_null, Tv)       # chars before null
        length = jnp.minimum(length, L - 2)

        pos = jnp.arange(L)[None, :]
        tokens = jnp.full((B, L), PAD, jnp.int32)
        tokens = jnp.where(pos == 0, BOS, tokens)
        char_pos = pos - 1
        char_ids = jnp.take_along_axis(
            jnp.pad(vis_ids, ((0, 0), (0, L)))[:, :L], jnp.clip(char_pos, 0, L - 1),
            axis=1) + 3  # charset index c (1-based after null) → 4 + (c-1)
        in_char = (char_pos >= 0) & (char_pos < length[:, None])
        tokens = jnp.where(in_char, char_ids, tokens)
        tokens = jnp.where(pos == length[:, None] + 1, EOS, tokens)
        vision_tokens = tokens

        scores = jnp.zeros((B, L), jnp.float32)

        def one_round(tokens, scores):
            # 1) delete
            text_feat = self.text_encoder(tokens)
            del_logits = self.decoder.word_del(text_feat, img_feature)
            del_prob = jax.nn.softmax(del_logits, -1)[..., 1]
            del_pred = del_prob > cfg.del_threshold
            can_del = jnp.sum(tokens != PAD, axis=1) > 2
            t2, s2 = apply_del_words(tokens, scores, del_pred, PAD, BOS, EOS)
            tokens = jnp.where(can_del[:, None], t2, tokens)
            scores = jnp.where(can_del[:, None], s2, scores)

            # 2) insert placeholders
            text_feat = self.text_encoder(tokens)
            ins_logits = self.decoder.mask_ins(text_feat, img_feature)
            ins_pred = jnp.argmax(ins_logits, -1)
            can_ins = jnp.sum(tokens != PAD, axis=1) < L
            t2, s2 = apply_ins_masks(tokens, scores, ins_pred, PAD, UNK)
            tokens = jnp.where(can_ins[:, None], t2, tokens)
            scores = jnp.where(can_ins[:, None], s2, scores)

            # 3) fill words
            text_feat = self.text_encoder(tokens)
            w_logits = self.decoder.word_ins(text_feat, img_feature)
            w_logp = jax.nn.log_softmax(w_logits, -1)
            w_pred = jnp.argmax(w_logp, -1).astype(tokens.dtype)
            w_score = jnp.max(w_logp, -1)
            has_unk = jnp.any(tokens == UNK, axis=1)
            t2, s2 = apply_ins_words(tokens, scores, w_pred, w_score, UNK)
            tokens = jnp.where(has_unk[:, None], t2, tokens)
            scores = jnp.where(has_unk[:, None], s2, scores)
            return tokens, scores

        # unrolled (max_iter+1 = 3 rounds): module calls inside lax.scan
        # would need nn.scan lifting; the unroll compiles to the same graph
        for _ in range(cfg.max_iter + 1):
            tokens, scores = one_round(tokens, scores)
        return {"tokens": tokens, "scores": scores,
                "vision_tokens": vision_tokens, "vision_logits": out["logits"]}


def levt_losses(res: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray],
                cfg: LevOCRConfig) -> Dict[str, jnp.ndarray]:
    """_compute_levt_loss (models.py:17): masked NLL + label smoothing.
    targets: mask_ins_targets [B,L-1], mask_ins_masks [B,L-1],
    word_ins_targets [B,L] (= tgt tokens), word_ins_masks [B,L],
    word_del_targets [B,L], word_del_masks [B,L], vision_targets [B,Tv]."""

    def smoothed_nll(logits, tgt, mask, ls):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        nll_mean = jnp.sum(nll * m) / denom
        if ls > 0:
            mean_all = jnp.sum(-jnp.mean(logp, axis=-1) * m) / denom
            return nll_mean * (1 - ls) + mean_all * ls, nll_mean
        return nll_mean, nll_mean

    mask_ins, _ = smoothed_nll(res["mask_ins_logits"], targets["mask_ins_targets"],
                               targets["mask_ins_masks"], 0.01)
    word_ins, word_nll = smoothed_nll(res["word_ins_logits"],
                                      targets["word_ins_targets"],
                                      targets["word_ins_masks"],
                                      cfg.label_smoothing)
    word_del, _ = smoothed_nll(res["word_del_logits"], targets["word_del_targets"],
                               targets["word_del_masks"], 0.0)
    out = {"mask_ins_loss": mask_ins, "word_ins_loss": word_ins,
           "word_del_loss": word_del, "word_nll": word_nll}
    total = mask_ins + word_ins + word_del
    if "vision_logits" in res:
        # vision CE (CrossEntropyLoss over charset ids, models.py:177);
        # absent in the language-branch-only mode (train_language_dist.py)
        vlogp = jax.nn.log_softmax(res["vision_logits"].astype(jnp.float32),
                                   -1)
        vt = targets["vision_targets"].astype(jnp.int32)
        vnll = -jnp.take_along_axis(vlogp, vt[..., None], axis=-1)[..., 0]
        vision = jnp.mean(vnll)
        out["vision_loss"] = vision
        total = total + vision
    out["loss"] = total
    return out

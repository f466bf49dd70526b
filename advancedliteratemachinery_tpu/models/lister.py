"""LISTER: length-insensitive scene-text recognizer (TPU-native).

Behavioral parity target (reference: OCR/LISTER/model):
- NeighborDecoder (nb_decoder.py:98): global query locates the start
  character on the feature map; a bilinear "neighbor navigator"
  (nb_decoder.py:24) builds an (N+1)x(N+1) transition matrix; `align_chars`
  (nb_decoder.py:132) walks it from the start map until the EOS slot's
  probability exceeds 0.6.
- Training walks with soft matmuls; eval sharpens each step with
  softmax_m1(x·k), k = min(1+2i, 16) (nb_decoder.py:163-169).
- Optional FEM refinement (iters>0): LocalAttentionModule over decoded char
  features (la_utils.py:109) + FeatureMapEnhancer merge back into the
  visual map (nb_decoder.py:49), then decode again.
- Losses (model.py:88-146): per-char CE normalized by length, EOS-location
  NLL, entropy regularizer, weighted (1.0, 0.01, 0.001) with a warmup gate
  that keeps only iteration-0 losses while rec loss > 2.1.

TPU-first: the data-dependent while loop becomes a fixed-length `lax.scan`
(max_ch static) producing the same char_maps/char_masks — finished lanes
are masked, not exited, so the whole batch stays one dense [B, L, N+1] x
[B, N+1, N+1] matmul chain on the MXU.
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
from advancedliteratemachinery_tpu.models.focalnet import (
    FOCALNET_VARIANTS,
    FocalNet,
    FocalNetBlock,
)


def _gelu(x):
    """Dtype-aware GELU (exact in fp32 for parity, tanh in bf16 for speed —
    see core.precision.gelu)."""
    from advancedliteratemachinery_tpu.core.precision import gelu
    return gelu(x)


NEG_INF = -1e30


def softmax_m1(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """(exp(x)-1)/sum(exp(x)-1) for x >= 0 (nb_decoder.py:17)."""
    fx = jnp.expm1(x)
    return fx / (jnp.sum(fx, axis=axis, keepdims=True) + 1e-10)


class BilinearNavigator(nn.Module):
    """y[b,i,j] = q[b,i]ᵀ W k[b,j] + bias — one (N, C)x(C, C)x(C, N+1) MXU
    chain (reference BilinearLayer, nb_decoder.py:24, out=1)."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, q, k):
        C = q.shape[-1]
        w = self.param("weight", nn.initializers.xavier_normal(),
                       (C, C), self.policy.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (), self.policy.param_dtype)
        qw = jnp.einsum("bic,cd->bid", q, w.astype(q.dtype))
        return jnp.einsum("bid,bjd->bij", qw, k) + b.astype(q.dtype)


class LocalSelfAttention(nn.Module):
    """Windowed self-attention over the char sequence (la_utils.py:10).
    Window of size w centered at each position; scale = log(w)/head_dim."""

    dim: int
    nhead: int
    window_size: int
    add_pos_bias: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask):
        import math

        p = self.policy
        B, T, C = x.shape
        w = self.window_size
        hd = C // self.nhead
        x = x * mask[..., None].astype(x.dtype)

        q = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype, name="q_fc")(x)
        pad = w // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        # windows[b, t, j] = xp[b, t + j] for j in [0, w)
        win = jnp.stack([xp[:, j:j + T] for j in range(w)], axis=2)  # [B,T,w,C]
        if self.add_pos_bias:
            bias = self.param("kv_pos_bias", nn.initializers.truncated_normal(0.02),
                              (w, C), p.param_dtype)
            win = win + bias.astype(win.dtype)
        kv = nn.Dense(2 * C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                      name="kv_fc")(win)
        k, v = jnp.split(kv, 2, axis=-1)
        qh = q.reshape(B, T, self.nhead, hd)
        kh = k.reshape(B, T, w, self.nhead, hd)
        vh = v.reshape(B, T, w, self.nhead, hd)
        scale = math.log(w) / hd
        alpha = jnp.einsum("bthd,btwhd->bthw", qh, kh) * scale
        alpha = jax.nn.softmax(alpha.astype(jnp.float32), axis=-1).astype(qh.dtype)
        out = jnp.einsum("bthw,btwhd->bthd", alpha, vh).reshape(B, T, C)
        out = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       name="proj")(out)
        return out * mask[..., None].astype(out.dtype)


class LocalAttentionModule(nn.Module):
    """Stack of windowed-attention blocks with layerscale (la_utils.py:109)."""

    dim: int
    nhead: int = 8
    window_size: int = 11
    num_layers: int = 1
    layerscale_value: float = 1e-6
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask):
        p = self.policy
        for i in range(self.num_layers):
            g1 = self.param(f"gamma1_{i}", nn.initializers.constant(self.layerscale_value),
                            (self.dim,), p.param_dtype)
            g2 = self.param(f"gamma2_{i}", nn.initializers.constant(self.layerscale_value),
                            (self.dim,), p.param_dtype)
            h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                             name=f"norm1_{i}")(x).astype(p.compute_dtype)
            h = LocalSelfAttention(self.dim, self.nhead, self.window_size,
                                   add_pos_bias=(i == 0), policy=p,
                                   name=f"sa_{i}")(h, mask)
            x = x + g1.astype(h.dtype) * h
            h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                             name=f"norm2_{i}")(x).astype(p.compute_dtype)
            h = nn.Dense(self.dim * 4, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"mlp_fc1_{i}")(h)
            h = _gelu(h)
            h = nn.Dense(self.dim, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         name=f"mlp_fc2_{i}")(h)
            x = x + g2.astype(h.dtype) * h
            x = x * mask[..., None].astype(x.dtype)
        return x


class FeatureMapEnhancer(nn.Module):
    """Merge decoded char features back into the visual map
    (nb_decoder.py:49): scatter char feats via attn maps, add, run FocalNet
    merge blocks, renorm."""

    dim: int
    num_layers: int = 1
    focal_level: int = 3
    max_kh: int = 1
    layerscale_value: float = 1e-6
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, feat_map, feat_char, char_attn_map, vis_mask, h: int = 1):
        """feat_map [B,N,C]; feat_char [B,T,C]; char_attn_map [B,T,N];
        vis_mask [B,N] → [B, h, w, C]."""
        p = self.policy
        B, N, C = feat_map.shape
        char_feat_map = jnp.einsum("btn,btc->bnc", char_attn_map, feat_char)
        char_feat_map = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                                     name="norm1")(char_feat_map)
        feat_map = feat_map + char_feat_map.astype(feat_map.dtype)

        mask_2d = vis_mask.reshape(B, h, -1)
        x = feat_map.reshape(B, h, N // h, C)
        for i in range(self.num_layers):
            x = FocalNetBlock(
                self.dim, 4.0, self.focal_level, 3, self.max_kh, 0.0,
                self.layerscale_value, use_layerscale=True, policy=p,
                name=f"merge_{i}",
            )(x, mask_2d)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm2")(x).astype(p.compute_dtype)
        return x * mask_2d[..., None].astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class LISTERConfig(ConfigBase):
    variant: str = "base"             # focalnet variant
    num_classes: int = 37             # [EOS] + 26 lowercase + 10 digits
    max_ch: int = 36                  # static decode length (L) incl. EOS slot
    iters: int = 0                    # FEM refinement iterations
    nhead: int = 8
    window_size: int = 11
    num_sa_layers: int = 1
    num_mg_layers: int = 1
    attn_scaling: bool = True
    p_threshold: float = 0.6
    detach_grad: bool = False
    drop_path_rate: float = 0.1
    coef_rec: float = 1.0
    coef_eos: float = 0.01
    coef_ent: float = 0.001

    def focalnet_config(self):
        return FOCALNET_VARIANTS[self.variant].replace(
            drop_path_rate=self.drop_path_rate)


class NeighborDecoder(nn.Module):
    config: LISTERConfig
    feat_dim: int
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        p = self.policy
        self.eos_emb = self.param("eos_emb", nn.initializers.truncated_normal(0.02),
                                  (self.feat_dim,), p.param_dtype)
        self.q_fc = nn.Dense(self.feat_dim, dtype=p.compute_dtype,
                             param_dtype=p.param_dtype, name="q_fc")
        # biased like the reference (nb_decoder.py:108 nn.Linear default)
        self.k_fc = nn.Dense(self.feat_dim, dtype=p.compute_dtype,
                             param_dtype=p.param_dtype, name="k_fc")
        self.navigator = BilinearNavigator(policy=p, name="neighbor_navigator")
        self.vis_cls = nn.Dense(cfg.num_classes, dtype=p.compute_dtype,
                                param_dtype=p.param_dtype, name="vis_cls")
        if cfg.iters > 0:
            self.cntx_module = LocalAttentionModule(
                self.feat_dim, cfg.nhead, cfg.window_size, cfg.num_sa_layers,
                policy=p, name="cntx_module")
            self.merge_layer = FeatureMapEnhancer(
                self.feat_dim, cfg.num_mg_layers, policy=p, name="merge_layer")

    def align_chars(self, start_map, nb_map, train: bool):
        """Fixed-length scan of the neighbor walk (nb_decoder.py:132).
        start_map [B, N+1]; nb_map [B, N+1, N+1] →
        char_maps [B, L, N+1], char_masks [B, L]."""
        cfg = self.config
        L = cfg.max_ch

        def step(carry, i):
            char_map, finished = carry
            out_map = char_map
            out_mask = (finished == 0).astype(jnp.float32)
            finished = finished + (char_map[:, -1] > cfg.p_threshold).astype(jnp.int32)
            if train:
                nxt = jnp.einsum("bn,bnm->bm", char_map, nb_map)
            else:
                k = jnp.minimum(1 + i * 2, 16).astype(char_map.dtype)
                sharp = softmax_m1(char_map * k, axis=-1)
                nxt = jnp.einsum("bn,bnm->bm", sharp, nb_map)
            return (nxt, finished), (out_map, out_mask)

        B = start_map.shape[0]
        finished0 = jnp.zeros((B,), jnp.int32)
        (_, _), (char_maps, char_masks) = jax.lax.scan(
            step, (start_map, finished0), jnp.arange(L))
        # scan stacks on axis 0 → [L, B, ...] → transpose
        return char_maps.swapaxes(0, 1), char_masks.swapaxes(0, 1)

    def decode_once(self, x, mask, train: bool):
        """x: [B, h, w, C]; mask: [B, h, w] → dict (nb_decoder.py:174)."""
        cfg = self.config
        B, h, w, C = x.shape
        N = h * w
        xf = x.reshape(B, N, C)
        mf = mask.reshape(B, N).astype(jnp.float32)

        g = jnp.sum(xf * mf[..., None].astype(xf.dtype), axis=1) / (
            jnp.sum(mf, axis=1, keepdims=True).astype(xf.dtype) + 1e-10)

        eos = jnp.broadcast_to(self.eos_emb.astype(xf.dtype), (B, 1, C))
        x_ext = jnp.concatenate([xf, eos], axis=1)  # [B, N+1, C]
        # pad-mask over N+1 (EOS slot always valid)
        valid_ext = jnp.concatenate([mf, jnp.ones((B, 1), jnp.float32)], axis=1)

        q_start = self.q_fc(g)                      # [B, C]
        k_feat = self.k_fc(x_ext)                   # [B, N+1, C]
        start_map = jnp.einsum("bnc,bc->bn", k_feat, q_start)
        if cfg.attn_scaling:
            start_map = start_map / (C ** 0.5)
        start_map = jnp.where(valid_ext > 0, start_map.astype(jnp.float32), NEG_INF)
        start_map = jax.nn.softmax(start_map, axis=1)

        q_feat = self.q_fc(xf)                      # [B, N, C]
        nb = self.navigator(q_feat, k_feat)         # [B, N, N+1]
        if cfg.attn_scaling:
            nb = nb / (C ** 0.5)
        nb = jnp.where(valid_ext[:, None, :] > 0, nb.astype(jnp.float32), NEG_INF)
        nb = jax.nn.softmax(nb, axis=2)
        # EOS row: absorbing state
        last = jax.nn.one_hot(N, N + 1, dtype=nb.dtype)
        nb_map = jnp.concatenate(
            [nb, jnp.broadcast_to(last, (B, 1, N + 1))], axis=1)  # [B, N+1, N+1]

        char_maps, char_masks = self.align_chars(start_map, nb_map, train)
        char_feats = jnp.einsum("bln,bnc->blc", char_maps.astype(x_ext.dtype), x_ext)
        char_feats = char_feats * char_masks[..., None].astype(char_feats.dtype)
        logits = self.vis_cls(char_feats).astype(jnp.float32)

        return dict(logits=logits, char_feats=char_feats, char_maps=char_maps,
                    char_masks=char_masks, nb_map=nb_map, h=h)

    def __call__(self, x, mask, train: bool = False):
        cfg = self.config
        B, h, w, C = x.shape
        res_list = [self.decode_once(x, mask, train)]
        if cfg.iters > 0:
            xd = jax.lax.stop_gradient(x) if cfg.detach_grad else x
            xf = xd.reshape(B, h * w, C)
            mf = mask.reshape(B, h * w).astype(jnp.float32)
            for _ in range(cfg.iters):
                prev = res_list[-1]
                char_cntx = self.cntx_module(prev["char_feats"], prev["char_masks"])
                cm = prev["char_maps"]
                if cfg.detach_grad:
                    cm = jax.lax.stop_gradient(cm)
                feat_map = self.merge_layer(xf, char_cntx, cm[:, :, :-1], mf, h=h)
                res_list.append(self.decode_once(feat_map, mask, train))
        return res_list


@MODELS.register("lister")
class LISTER(nn.Module):
    config: LISTERConfig = LISTERConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, mask=None, train: bool = False,
                 deterministic: Optional[bool] = None):
        """images [B, 32, W, 3] (W variable per bucket); mask [B, 32, W].
        Returns list of per-iteration dicts (logits [B, L, nC], char_maps,
        char_masks, ...)."""
        cfg = self.config
        det = not train if deterministic is None else deterministic
        feat, fmask = FocalNet(cfg.focalnet_config(), policy=self.policy,
                               name="encoder")(images, mask, deterministic=det)
        decoder = NeighborDecoder(cfg, feat.shape[-1], policy=self.policy,
                                  name="decoder")
        return decoder(feat, fmask, train=train)


def lister_losses(res_list, labels, label_lens, cfg: LISTERConfig
                  ) -> Dict[str, jnp.ndarray]:
    """Reference loss (model.py:88-151). labels [B, L] (chars + EOS(0),
    zero-padded — EOS id is 0); label_lens includes the EOS token."""
    B, L = labels.shape
    pos = jnp.arange(L)[None, :]
    mask = (pos < label_lens[:, None]).astype(jnp.float32)

    def rec_loss(logits):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        per_seq = jnp.sum(nll * mask, axis=1) / (label_lens + 1e-10)
        return jnp.mean(per_seq)

    def eos_loss(char_maps):
        idx = (label_lens - 1).astype(jnp.int32)
        eos_maps = jnp.take_along_axis(
            char_maps, idx[:, None, None].repeat(char_maps.shape[2], 2), axis=1
        )[:, 0, :]
        return jnp.mean(-jnp.log(eos_maps[:, -1] + 1e-10))

    def ent_loss(char_maps):
        import math
        p = char_maps
        ent = jnp.sum(p * -jnp.log(p + 1e-10), axis=-1) / math.log(p.shape[-1] + 1)
        ent = jnp.sum(ent * mask, axis=-1) / (jnp.sum(mask, axis=-1) + 1e-10)
        return jnp.mean(ent)

    l_rec = [rec_loss(r["logits"][:, :L]) for r in res_list]
    l_eos = [eos_loss(r["char_maps"][:, :L]) for r in res_list]
    l_ent = [ent_loss(r["char_maps"][:, :L]) for r in res_list]

    n = len(l_rec)
    if n > 1:
        # warmup gate (model.py:137): while all rec losses > 2.1 train only iter 0
        warm = jnp.all(jnp.stack(l_rec) > 2.1)
        rest_w = jnp.where(warm, 0.0, 1.0)
        rec = l_rec[0] + rest_w * sum(l_rec[1:]) / (n - 1)
        eos = l_eos[0] + rest_w * sum(l_eos[1:]) / (n - 1)
        ent = l_ent[0] + rest_w * sum(l_ent[1:]) / (n - 1)
    else:
        rec, eos, ent = l_rec[0], l_eos[0], l_ent[0]

    loss = cfg.coef_rec * rec + cfg.coef_eos * eos + cfg.coef_ent * ent
    return {"loss": loss, "rec_loss": rec, "eos_loss": eos, "ent_loss": ent}


def lister_greedy_decode(logits: jnp.ndarray, char_masks: jnp.ndarray):
    """Greedy ids per position, EOS(0) pruning is host-side via the codec.
    Returns (ids [B, L], valid mask)."""
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return ids, char_masks

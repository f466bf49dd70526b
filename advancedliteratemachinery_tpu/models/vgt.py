"""VGT: two-stream (vision + word-grid) document layout backbone.

Behavioral parity target (reference DocumentUnderstanding/VGT/object_detection):
- Word-grid ("chargrid") embedding: rasterize wordpiece ids into the image
  plane, embed + project (ditod/Wordnn_embedding.py:16; vocab 30552,
  embedding_dim 64).
- Two-stream BEiT/DiT backbone (ditod/VGTbeit.py:550 BEiT): per-stream
  patch embeds + cls tokens; the RELEASED configs
  (Configs/cascade/*_VGT_cascade_PTM.yaml) use `VGT_dit_base_patch16`
  (VGTbeit.py:869): self_depth=12, **cross_depth=0**, layerscale
  init_values=0.1, qkv_bias=True, POS_TYPE default "shared_rel" → ONE
  shared RelativePositionBias (VGTbeit.py:466) added to every block's
  attention, no absolute positions. Features tapped at blocks 3/5/7/11
  (config.py:16 OUT_FEATURES) → per-stream fpn1..4 ops (4x deconv+BN+GELU+
  deconv / 2x deconv / identity / maxpool, VGTbeit.py:643-669).
- CrossBlock (VGTbeit.py:135) exists for cross_depth>0 variants:
  per-stream cross-attention (CrossAttention :84 — q + packed kv, q/v
  biases, k bias zero) with gamma_vis/gamma_grid layerscales, an inner
  CrossSelfBlock (:191 — per-stream self attention, own gammas), then
  per-stream MLPs with gamma_1/gamma_2.
- FeatureMerge (ditod/FeatureMerge.py:4): released merge_type is 'Sum';
  'Concat' adds vis/text/alpha projections.
- detectron2 GridFPN on top (ditod/VGTbackbone.py:123): 1x1 laterals +
  3x3 output convs + LastLevelMaxPool p6.

The shared relative-position table ships at the pretraining window (14x14
for 224/16); the reference bicubic-interpolates it to the runtime patch
grid on every forward (VGTbeit.py:509, F.interpolate bicubic a=-0.75).
Here the window is static per config, so the importer interpolates ONCE at
load (engine/checkpoint.py import_vgt).

TPU-native divergence (documented): the reference's detection head is
detectron2 Cascade R-CNN (ditod/VGT.py:34); here the fused pyramid feeds
the framework's CenterNet-style head (models/dla.py pattern) — anchor-free
dense heads map better onto fixed-shape XLA graphs than cascaded RoI
stages. Checkpoint import covers everything through the GridFPN.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import gelu as _gelu, Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.layers import Mlp

BN_MOMENTUM = 0.9


def rasterize_word_grid(input_ids: np.ndarray, bboxes: np.ndarray,
                        height: int, width: int, stride: int = 1) -> np.ndarray:
    """Host-side chargrid map (Wordnn_embedding.py:56-80): paint each word's
    token id into its bbox. ids [N]; bboxes [N, 4] (x1,y1,x2,y2 image
    coords). → int32 [H/stride, W/stride] (0 = background)."""
    H, W = height // stride, width // stride
    grid = np.zeros((H, W), np.int64)
    n = min(len(input_ids), len(bboxes))
    for i in range(n):
        x1, y1, x2, y2 = (np.asarray(bboxes[i]) / stride).round().astype(int)
        x1, x2 = np.clip([x1, x2], 0, W)
        y1, y2 = np.clip([y1, y2], 0, H)
        grid[y1:y2, x1:x2] = int(input_ids[i])
    return grid


def readjust_bbox_coords(boxes, token_lists):
    """Split each word's (x, y, w, h) box horizontally among its subword
    tokens (reference object_detection/create_grid_input.py:57
    readjust_bbox_coords)."""
    out = []
    for box, ids in zip(boxes, token_lists):
        if len(ids) > 1:
            w = box[2] / len(ids)
            for i in range(len(ids)):
                out.append((box[0] + i * w, box[1], w, box[3]))
        else:
            out.append((box[0], box[1], box[2], box[3]))
    return out


def build_grid_input(words, tokenize_fn):
    """pdfplumber-style word dicts → the VGT grid dict (reference
    create_grid_input.py:86 create_grid_dict): per-word tokenization
    WITHOUT specials, subword-split boxes.

    words: [{"text", "x0", "top", "x1", "bottom"}] (pdfplumber
    extract_words keys); tokenize_fn(texts) -> list of id-lists.
    Returns {"input_ids": [T], "bbox_subword_list": [T, 4] (x, y, w, h),
    "texts": [N], "bbox_texts_list": [N, 4]}.
    """
    texts = [w["text"] for w in words]
    word_boxes = [(w["x0"], w["top"], w["x1"] - w["x0"],
                   w["bottom"] - w["top"]) for w in words]
    token_lists = tokenize_fn(texts) if texts else []
    sub_boxes = readjust_bbox_coords(word_boxes, token_lists)
    flat_ids = [i for ids in token_lists for i in ids]
    return {
        "input_ids": np.asarray(flat_ids, np.int64),
        "bbox_subword_list": np.asarray(sub_boxes, np.float64).reshape(-1, 4),
        "texts": texts,
        "bbox_texts_list": np.asarray(word_boxes, np.float64).reshape(-1, 4),
    }


def grid_ids_from_words(words, tokenize_fn, height: int, width: int,
                        stride: int = 1) -> np.ndarray:
    """Words → rasterized chargrid id map (build_grid_input +
    rasterize_word_grid; boxes converted from (x, y, w, h) to xyxy)."""
    g = build_grid_input(words, tokenize_fn)
    if len(g["input_ids"]) == 0:
        return np.zeros((height // stride, width // stride), np.int64)
    b = g["bbox_subword_list"]
    xyxy = np.stack([b[:, 0], b[:, 1], b[:, 0] + b[:, 2],
                     b[:, 1] + b[:, 3]], axis=1)
    return rasterize_word_grid(g["input_ids"], xyxy, height, width, stride)


class WordGridEmbedding(nn.Module):
    """Embedding + projection of the rasterized id map
    (Wordnn_embedding.py:16; vocab 30552 per released configs)."""

    vocab_size: int = 30552
    hidden_size: int = 768
    embedding_dim: int = 64
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, grid_ids):
        p = self.policy
        emb = nn.Embed(self.vocab_size, self.hidden_size,
                       param_dtype=p.param_dtype, name="embedding")(grid_ids)
        return nn.Dense(self.embedding_dim, use_bias=False, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name="embedding_proj")(
            emb.astype(p.compute_dtype))


def _beit_rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """Static relative-position index table [(wh·ww+1)², ] into a
    [(2wh−1)(2ww−1)+3, H] bias table (VGTbeit.py:256-276 — cls row/col/
    corner use the last 3 slots). Pure numpy: compile-time constant."""
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel       # cls-to-token
    idx[:, 0] = num_rel + 1   # token-to-cls
    idx[0, 0] = num_rel + 2   # cls-to-cls
    return idx.reshape(-1)


class SharedRelPosBias(nn.Module):
    """Shared RelativePositionBias (VGTbeit.py:466) for POS_TYPE
    'shared_rel' — one table for all blocks of both streams."""

    window: Tuple[int, int]
    heads: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        wh, ww = self.window
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param("relative_position_bias_table",
                           nn.initializers.zeros, (num_rel, self.heads),
                           self.policy.param_dtype)
        idx = jnp.asarray(_beit_rel_pos_index(wh, ww))
        n = wh * ww + 1
        return table[idx].reshape(n, n, self.heads).transpose(2, 0, 1)


class BEiTAttention(nn.Module):
    """BEiT/DiT attention (VGTbeit.py:230): qkv projection without bias +
    learned q/v biases (k bias fixed at zero), optional per-block
    relative-position table, optional shared bias passed by the caller."""

    dim: int
    heads: int
    window: Optional[Tuple[int, int]] = None   # per-block table if set

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, rel_bias: Optional[jnp.ndarray] = None):
        p = self.policy
        B, N, D = x.shape
        H, hd = self.heads, self.dim // self.heads
        qkv_w = nn.Dense(3 * D, use_bias=False, dtype=p.compute_dtype,
                         param_dtype=p.param_dtype, name="qkv")
        q_bias = self.param("q_bias", nn.initializers.zeros, (D,), p.param_dtype)
        v_bias = self.param("v_bias", nn.initializers.zeros, (D,), p.param_dtype)
        qkv = qkv_w(x) + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(x.dtype)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, H, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]

        s = jnp.einsum("bihd,bjhd->bhij", q, k) / (hd ** 0.5)
        if self.window is not None:
            wh, ww = self.window
            num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
            table = self.param("relative_position_bias_table",
                               nn.initializers.zeros, (num_rel, H),
                               p.param_dtype)
            idx = jnp.asarray(_beit_rel_pos_index(wh, ww))
            own = table[idx].reshape(N, N, H).transpose(2, 0, 1)
            s = s + own[None].astype(s.dtype)
        if rel_bias is not None:
            s = s + rel_bias[None].astype(s.dtype)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhij,bjhd->bihd", a, v).reshape(B, N, D)
        return nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                        name="proj")(o)


class BEiTBlock(nn.Module):
    """BEiT/DiT pre-norm block with optional layerscale (VGTbeit.py:361)."""

    dim: int
    heads: int
    window: Optional[Tuple[int, int]] = None    # per-block rel table if set
    mlp_ratio: float = 4.0
    layerscale_value: Optional[float] = 0.1     # None → no gammas

    policy: Policy = DEFAULT_POLICY

    def _gamma(self, name):
        if self.layerscale_value is None:
            return None
        return self.param(name, nn.initializers.constant(self.layerscale_value),
                          (self.dim,), self.policy.param_dtype)

    @nn.compact
    def __call__(self, x, rel_bias: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        p = self.policy
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm1")(x)
        o = BEiTAttention(self.dim, self.heads, self.window, policy=p,
                          name="attn")(h.astype(p.compute_dtype), rel_bias)
        g1 = self._gamma("gamma_1")
        x = x + (o if g1 is None else g1.astype(o.dtype) * o)

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, policy=p,
                name="mlp")(h.astype(p.compute_dtype))
        g2 = self._gamma("gamma_2")
        return x + (h if g2 is None else g2.astype(h.dtype) * h)


class CrossAttention(nn.Module):
    """VGTbeit.py:84: q projection (no weight bias + learned q_bias) over x,
    packed kv projection over y (k bias zero, learned v_bias)."""

    dim: int
    heads: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, y):
        p = self.policy
        B, Nq, D = x.shape
        H, hd = self.heads, self.dim // self.heads
        q_bias = self.param("q_bias", nn.initializers.zeros, (D,), p.param_dtype)
        v_bias = self.param("v_bias", nn.initializers.zeros, (D,), p.param_dtype)
        q = nn.Dense(D, use_bias=False, dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="q")(x) + q_bias.astype(x.dtype)
        kv = nn.Dense(2 * D, use_bias=False, dtype=p.compute_dtype,
                      param_dtype=p.param_dtype, name="kv")(y)
        kv = kv + jnp.concatenate([jnp.zeros_like(v_bias), v_bias]).astype(y.dtype)
        k, v = jnp.split(kv.reshape(B, -1, 2, H, hd), 2, axis=2)
        q = q.reshape(B, Nq, H, hd)
        k, v = k[:, :, 0], v[:, :, 0]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, Nq, D)
        return nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                        name="proj")(o)


class CrossSelfBlock(nn.Module):
    """Inner per-stream self-attention stage of CrossBlock
    (VGTbeit.py:191): norms + BEiT attentions + gammas, no MLP."""

    dim: int
    heads: int
    layerscale_value: Optional[float] = 0.1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, vis, grid):
        p = self.policy

        def ln(name):
            return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                param_dtype=p.param_dtype, name=name)

        ov = BEiTAttention(self.dim, self.heads, policy=p, name="vis_attn")(
            ln("norm_vis")(vis).astype(p.compute_dtype))
        og = BEiTAttention(self.dim, self.heads, policy=p, name="grid_attn")(
            ln("norm_grid")(grid).astype(p.compute_dtype))
        if self.layerscale_value is not None:
            gv = self.param("gamma_vis", nn.initializers.constant(
                self.layerscale_value), (self.dim,), p.param_dtype)
            gg = self.param("gamma_grid", nn.initializers.constant(
                self.layerscale_value), (self.dim,), p.param_dtype)
            ov = gv.astype(ov.dtype) * ov
            og = gg.astype(og.dtype) * og
        return vis + ov, grid + og


class VGTCrossBlock(nn.Module):
    """Faithful CrossBlock (VGTbeit.py:135): bidirectional cross-attention
    (gamma_vis/gamma_grid) → inner CrossSelfBlock → per-stream MLPs
    (gamma_1/gamma_2)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_value: Optional[float] = 0.1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, vis, grid):
        p = self.policy

        def ln(name):
            return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                param_dtype=p.param_dtype, name=name)

        def gamma(name):
            if self.layerscale_value is None:
                return None
            return self.param(name, nn.initializers.constant(
                self.layerscale_value), (self.dim,), p.param_dtype)

        nv = ln("norm_vis")(vis).astype(p.compute_dtype)
        ng = ln("norm_grid")(grid).astype(p.compute_dtype)
        ov = CrossAttention(self.dim, self.num_heads, policy=p,
                            name="vis_attn")(nv, ng)
        og = CrossAttention(self.dim, self.num_heads, policy=p,
                            name="grid_attn")(ng, nv)
        gv, gg = gamma("gamma_vis"), gamma("gamma_grid")
        vis = vis + (ov if gv is None else gv.astype(ov.dtype) * ov)
        grid = grid + (og if gg is None else gg.astype(og.dtype) * og)

        vis, grid = CrossSelfBlock(self.dim, self.num_heads,
                                   self.layerscale_value, policy=p,
                                   name="self_block")(vis, grid)

        h = ln("norm2_vis")(vis).astype(p.compute_dtype)
        mv = Mlp(int(self.dim * self.mlp_ratio), self.dim, policy=p,
                 name="vis_mlp")(h)
        h = ln("norm2_grid")(grid).astype(p.compute_dtype)
        mg = Mlp(int(self.dim * self.mlp_ratio), self.dim, policy=p,
                 name="grid_mlp")(h)
        g1, g2 = gamma("gamma_1"), gamma("gamma_2")
        vis = vis + (mv if g1 is None else g1.astype(mv.dtype) * mv)
        grid = grid + (mg if g2 is None else g2.astype(mg.dtype) * mg)
        return vis, grid


@dataclasses.dataclass(frozen=True)
class VGTConfig(ConfigBase):
    # released VGT_dit_base_patch16 recipe (VGTbeit.py:869 + config.py)
    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    embed_dim: int = 768
    self_depth: int = 12
    cross_depth: int = 0
    num_heads: int = 12
    grid_embedding_dim: int = 64
    vocab_size: int = 30552
    pos_type: str = "shared_rel"        # "shared_rel" | "abs" | "rel"
    out_indices: Tuple[int, ...] = (3, 5, 7, 11)
    layerscale_value: Optional[float] = 0.1
    merge_type: str = "Sum"             # released configs use Sum
    fpn_dim: int = 256                  # detectron2 FPN.OUT_CHANNELS
    num_classes: int = 5                # PubLayNet categories

    @property
    def window(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)


@MODELS.register("vgt")
class VGTBackbone(nn.Module):
    config: VGTConfig = VGTConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, grid_ids, train: bool = False,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """images [B,H,W,3]; grid_ids [B,H,W] int token map →
        merged + FPN pyramid {p2 (1/4) … p6 (1/64)}."""
        cfg = self.config
        p = self.policy
        B, H, W, _ = images.shape
        ps = cfg.patch_size
        Hp, Wp = H // ps, W // ps
        D = cfg.embed_dim

        vis = nn.Conv(D, (ps, ps), (ps, ps), padding="VALID",
                      dtype=p.compute_dtype, param_dtype=p.param_dtype,
                      name="patch_embed")(images.astype(p.compute_dtype))
        vis = vis.reshape(B, Hp * Wp, D)

        grid_img = WordGridEmbedding(cfg.vocab_size, 768, cfg.grid_embedding_dim,
                                     policy=p, name="wordnn")(grid_ids)
        grid = nn.Conv(D, (ps, ps), (ps, ps), padding="VALID",
                       dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       name="grid_patch_embed")(grid_img)
        grid = grid.reshape(B, Hp * Wp, D)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, D), p.param_dtype)
        gtok = self.param("grid_token", nn.initializers.truncated_normal(0.02),
                          (1, 1, D), p.param_dtype)
        vis = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(vis.dtype), vis], 1)
        grid = jnp.concatenate(
            [jnp.broadcast_to(gtok, (B, 1, D)).astype(grid.dtype), grid], 1)
        if cfg.pos_type == "abs":
            pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                             (1, Hp * Wp + 1, D), p.param_dtype)
            gpos = self.param("grid_pos_embed",
                              nn.initializers.truncated_normal(0.02),
                              (1, Hp * Wp + 1, D), p.param_dtype)
            vis = vis + pos.astype(vis.dtype)
            grid = grid + gpos.astype(grid.dtype)

        rel_bias = None
        if cfg.pos_type == "shared_rel":
            rel_bias = SharedRelPosBias((Hp, Wp), cfg.num_heads, policy=p,
                                        name="rel_pos_bias")()
        block_window = (Hp, Wp) if cfg.pos_type == "rel" else None

        feats: List[jnp.ndarray] = []
        gfeats: List[jnp.ndarray] = []
        for i in range(cfg.self_depth):
            vis = BEiTBlock(D, cfg.num_heads, block_window,
                            layerscale_value=cfg.layerscale_value,
                            policy=p, name=f"blocks_{i}")(
                vis, rel_bias, deterministic=deterministic)
            if i in cfg.out_indices:
                feats.append(vis[:, 1:].reshape(B, Hp, Wp, D))
        for i in range(cfg.self_depth):
            grid = BEiTBlock(D, cfg.num_heads, block_window,
                             layerscale_value=cfg.layerscale_value,
                             policy=p, name=f"grid_blocks_{i}")(
                grid, rel_bias, deterministic=deterministic)
            if i in cfg.out_indices:
                gfeats.append(grid[:, 1:].reshape(B, Hp, Wp, D))

        for i in range(cfg.cross_depth):
            vis, grid = VGTCrossBlock(D, cfg.num_heads,
                                      layerscale_value=cfg.layerscale_value,
                                      policy=p,
                                      name=f"cross_blocks_{i}")(vis, grid)
            feats.append(vis[:, 1:].reshape(B, Hp, Wp, D))
            gfeats.append(grid[:, 1:].reshape(B, Hp, Wp, D))
        feats = feats[:4]
        gfeats = gfeats[:4]

        # BEiT fpn ops (VGTbeit.py:643): 4x deconv+BN+GELU+deconv, 2x
        # deconv, identity, 2x maxpool — all at embed_dim channels
        def fpn_op(x, level, prefix):
            if level == 0:
                x = nn.ConvTranspose(D, (2, 2), (2, 2), dtype=p.compute_dtype,
                                     param_dtype=p.param_dtype,
                                     name=f"{prefix}fpn1_deconv1")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, dtype=jnp.float32,
                                 param_dtype=p.param_dtype,
                                 name=f"{prefix}fpn1_bn")(x).astype(p.compute_dtype)
                x = _gelu(x)
                x = nn.ConvTranspose(D, (2, 2), (2, 2), dtype=p.compute_dtype,
                                     param_dtype=p.param_dtype,
                                     name=f"{prefix}fpn1_deconv2")(x)
            elif level == 1:
                x = nn.ConvTranspose(D, (2, 2), (2, 2), dtype=p.compute_dtype,
                                     param_dtype=p.param_dtype,
                                     name=f"{prefix}fpn2_deconv")(x)
            elif level == 3:
                x = nn.max_pool(x, (2, 2), (2, 2))
            return x

        merged = []
        for lvl in range(4):
            v = fpn_op(feats[lvl], lvl, "")
            g = fpn_op(gfeats[lvl], lvl, "grid_")
            if cfg.merge_type == "Sum":
                merged.append(v + g)
            else:  # Concat with adapter fcs (FeatureMerge.py:40-50)
                va = nn.relu(nn.Dense(D, dtype=p.compute_dtype,
                                      param_dtype=p.param_dtype,
                                      name=f"vis_proj_{lvl}")(v))
                ga = nn.relu(nn.Dense(D, dtype=p.compute_dtype,
                                      param_dtype=p.param_dtype,
                                      name=f"text_proj_{lvl}")(g))
                merged.append(nn.Dense(D, dtype=p.compute_dtype,
                                       param_dtype=p.param_dtype,
                                       name=f"alpha_proj_{lvl}")(
                    jnp.concatenate([va, ga], -1)))

        # detectron2 GridFPN (VGTbackbone.py:123): laterals + 3x3 outputs,
        # top-down nearest sum, extra p6 maxpool
        lat = [nn.Conv(cfg.fpn_dim, (1, 1), dtype=p.compute_dtype,
                       param_dtype=p.param_dtype, name=f"fpn_lateral{i + 2}")(
                   merged[i]) for i in range(4)]
        for i in range(2, -1, -1):
            up = jax.image.resize(lat[i + 1], lat[i].shape, method="nearest")
            lat[i] = lat[i] + up
        out = {}
        for i in range(4):
            out[f"p{i + 2}"] = nn.Conv(
                cfg.fpn_dim, (3, 3), padding="SAME", dtype=p.compute_dtype,
                param_dtype=p.param_dtype, name=f"fpn_output{i + 2}")(lat[i])
        out["p6"] = nn.max_pool(out["p5"], (1, 1), (2, 2))
        return out


class VGTDetector(nn.Module):
    """Fused pyramid → CenterNet-style layout detection (TPU-native head;
    see module docstring for the Cascade-R-CNN divergence note)."""

    config: VGTConfig = VGTConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, grid_ids, train: bool = False,
                 deterministic: bool = True):
        cfg = self.config
        p = self.policy
        pyr = VGTBackbone(cfg, policy=p, name="backbone")(
            images, grid_ids, train=train, deterministic=deterministic)
        x = pyr["p2"]
        heads = {}
        for name, ch in (("hm", cfg.num_classes), ("wh", 8), ("reg", 2)):
            h = nn.Conv(cfg.fpn_dim, (3, 3), padding="SAME", dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name=f"{name}_conv")(x)
            h = nn.relu(h)
            bias_init = (nn.initializers.constant(-2.19) if name == "hm"
                         else nn.initializers.zeros)
            heads[name] = nn.Conv(ch, (1, 1), bias_init=bias_init,
                                  dtype=p.compute_dtype, param_dtype=p.param_dtype,
                                  name=f"{name}_out")(h).astype(jnp.float32)
        return heads

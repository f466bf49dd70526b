"""VGT: two-stream (vision + word-grid) document layout backbone.

Behavioral parity target (reference DocumentUnderstanding/VGT):
- Word-grid ("chargrid") embedding: rasterize wordpiece ids into the image
  plane, embed + project (ditod/Wordnn_embedding.py:16).
- Two-stream BEiT backbone (ditod/VGTbeit.py:550): per-stream patch embeds
  + cls tokens, `self_depth`=7 self blocks per stream, `cross_depth`=5
  bidirectional cross blocks (:135 CrossBlock — vis attends grid / grid
  attends vis, both with MLPs); multi-scale outputs through BEiT-FPN ops
  (4x/2x/1x/0.5x) after the cross stages.
- FeatureMerge (ditod/FeatureMerge.py:4): per-scale fusion of visual and
  grid maps ('Sum' or 'Concat' with adapter fcs).

TPU-native divergence (documented): the reference's detection head is
detectron2 Cascade R-CNN (ditod/VGT.py:31); here the fused pyramid feeds
the framework's CenterNet-style head (models/dla.py pattern) — anchor-free
dense heads map better onto fixed-shape XLA graphs than cascaded RoI
stages. Checkpoint import covers the backbone streams.
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
from advancedliteratemachinery_tpu.models.layers import EncoderBlock, Mlp


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


class WordGridEmbedding(nn.Module):
    """Embedding + projection of the rasterized id map
    (Wordnn_embedding.py:16, vocab 30522 BERT/BROS, proj to 64)."""

    vocab_size: int = 30522
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


class CrossAttention(nn.Module):
    dim: int
    num_heads: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, q_in, kv_in):
        p = self.policy
        B, Nq, D = q_in.shape
        H = self.num_heads
        hd = D // H
        q = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="q")(q_in).reshape(B, Nq, H, hd)
        k = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="k")(kv_in).reshape(B, -1, H, hd)
        v = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="v")(kv_in).reshape(B, -1, H, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, Nq, D)
        return nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                        name="proj")(o)


class VGTCrossBlock(nn.Module):
    """Bidirectional cross block (VGTbeit.py:135)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, vis, grid):
        p = self.policy

        def ln(name):
            return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                param_dtype=p.param_dtype, name=name)

        nv = ln("norm_vis")(vis).astype(p.compute_dtype)
        ng = ln("norm_grid")(grid).astype(p.compute_dtype)
        vis = vis + CrossAttention(self.dim, self.num_heads, policy=p,
                                   name="vis_attn")(nv, ng)
        grid = grid + CrossAttention(self.dim, self.num_heads, policy=p,
                                     name="grid_attn")(ng, nv)
        h = ln("norm2_vis")(vis).astype(p.compute_dtype)
        vis = vis + Mlp(int(self.dim * self.mlp_ratio), self.dim, policy=p,
                        name="vis_mlp")(h)
        h = ln("norm2_grid")(grid).astype(p.compute_dtype)
        grid = grid + Mlp(int(self.dim * self.mlp_ratio), self.dim, policy=p,
                          name="grid_mlp")(h)
        return vis, grid


@dataclasses.dataclass(frozen=True)
class VGTConfig(ConfigBase):
    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    embed_dim: int = 768
    self_depth: int = 7
    cross_depth: int = 5
    num_heads: int = 12
    grid_embedding_dim: int = 64
    vocab_size: int = 30522
    fpn_dim: int = 256
    merge_type: str = "Concat"          # FeatureMerge.py default style
    num_classes: int = 5                # PubLayNet categories
    use_beit: bool = False              # BEiT/DiT blocks (VGTbeit.py:361) —
    layerscale_value: float = 0.1       # required for DiT checkpoint import


def _beit_rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """Static relative-position index table [(wh·ww+1)², ] into a
    [(2wh−1)(2ww−1)+3, H] bias table (VGTbeit.py:230 Attention — cls row/
    col/corner use the last 3 slots). Pure numpy: compile-time constant."""
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


class BEiTBlock(nn.Module):
    """BEiT/DiT pre-norm block: qkv without bias + learned q/v biases (k bias
    fixed at zero), static-window relative-position bias, layerscale
    (VGTbeit.py:230 Attention + :361 Block). Window is (Hp, Wp) + cls."""

    dim: int
    heads: int
    window: Tuple[int, int]
    mlp_ratio: float = 4.0
    layerscale_value: float = 0.1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.policy
        B, N, D = x.shape
        H, hd = self.heads, self.dim // self.heads
        wh, ww = self.window

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm1")(x).astype(p.compute_dtype)
        qkv_w = nn.Dense(3 * D, use_bias=False, dtype=p.compute_dtype,
                         param_dtype=p.param_dtype, name="qkv")
        q_bias = self.param("q_bias", nn.initializers.zeros, (D,),
                            p.param_dtype)
        v_bias = self.param("v_bias", nn.initializers.zeros, (D,),
                            p.param_dtype)
        qkv = qkv_w(h) + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(h.dtype)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, H, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]

        s = jnp.einsum("bihd,bjhd->bhij", q, k) / (hd ** 0.5)
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param("rel_pos_table", nn.initializers.zeros,
                           (num_rel, H), p.param_dtype)
        idx = jnp.asarray(_beit_rel_pos_index(wh, ww))
        bias = table[idx].reshape(N, N, H).transpose(2, 0, 1)
        s = s + bias[None].astype(s.dtype)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhij,bjhd->bihd", a, v).reshape(B, N, D)
        o = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="proj")(o)
        g1 = self.param("gamma_1", nn.initializers.constant(
            self.layerscale_value), (D,), p.param_dtype)
        g2 = self.param("gamma_2", nn.initializers.constant(
            self.layerscale_value), (D,), p.param_dtype)
        x = x + g1.astype(o.dtype) * o

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="norm2")(x).astype(p.compute_dtype)
        h = nn.Dense(int(D * self.mlp_ratio), dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="mlp_fc1")(h)
        h = _gelu(h)
        h = nn.Dense(D, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="mlp_fc2")(h)
        return x + g2.astype(h.dtype) * h


@MODELS.register("vgt")
class VGTBackbone(nn.Module):
    config: VGTConfig = VGTConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, grid_ids, deterministic: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        """images [B,H,W,3]; grid_ids [B,H,W] int token map →
        fused pyramid {p2 (1/4), p3 (1/8), p4 (1/16), p5 (1/32)}."""
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
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, Hp * Wp + 1, D), p.param_dtype)
        gpos = self.param("grid_pos_embed", nn.initializers.truncated_normal(0.02),
                          (1, Hp * Wp + 1, D), p.param_dtype)
        vis = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)).astype(vis.dtype),
                               vis], 1) + pos.astype(vis.dtype)
        grid = jnp.concatenate([jnp.broadcast_to(gtok, (B, 1, D)).astype(grid.dtype),
                                grid], 1) + gpos.astype(grid.dtype)

        for i in range(cfg.self_depth):
            if cfg.use_beit:
                vis = BEiTBlock(D, cfg.num_heads, (Hp, Wp),
                                layerscale_value=cfg.layerscale_value,
                                policy=p, name=f"blocks_{i}")(
                    vis, deterministic=deterministic)
                grid = BEiTBlock(D, cfg.num_heads, (Hp, Wp),
                                 layerscale_value=cfg.layerscale_value,
                                 policy=p, name=f"grid_blocks_{i}")(
                    grid, deterministic=deterministic)
            else:
                vis = EncoderBlock(D, cfg.num_heads, policy=p,
                                   name=f"blocks_{i}")(
                    vis, deterministic=deterministic)
                grid = EncoderBlock(D, cfg.num_heads, policy=p,
                                    name=f"grid_blocks_{i}")(
                    grid, deterministic=deterministic)

        feats: List[jnp.ndarray] = []
        gfeats: List[jnp.ndarray] = []
        for i in range(cfg.cross_depth):
            vis, grid = VGTCrossBlock(D, cfg.num_heads, policy=p,
                                      name=f"cross_blocks_{i}")(vis, grid)
            if i >= cfg.cross_depth - 4:      # last 4 stages → 4 scales
                feats.append(vis[:, 1:].reshape(B, Hp, Wp, D))
                gfeats.append(grid[:, 1:].reshape(B, Hp, Wp, D))

        # BEiT-FPN ops: 4x, 2x, 1x, 0.5x from the 1/16 ViT grid
        def fpn_op(x, level, prefix):
            if level == 0:
                x = nn.ConvTranspose(D // 2, (2, 2), (2, 2), dtype=p.compute_dtype,
                                     param_dtype=p.param_dtype,
                                     name=f"{prefix}fpn1_deconv1")(x)
                x = _gelu(x)
                x = nn.ConvTranspose(D // 4, (2, 2), (2, 2), dtype=p.compute_dtype,
                                     param_dtype=p.param_dtype,
                                     name=f"{prefix}fpn1_deconv2")(x)
            elif level == 1:
                x = nn.ConvTranspose(D // 2, (2, 2), (2, 2), dtype=p.compute_dtype,
                                     param_dtype=p.param_dtype,
                                     name=f"{prefix}fpn2_deconv")(x)
            elif level == 3:
                x = nn.max_pool(x, (2, 2), (2, 2))
            return nn.Conv(cfg.fpn_dim, (1, 1), dtype=p.compute_dtype,
                           param_dtype=p.param_dtype, name=f"{prefix}out{level}")(x)

        out = {}
        names = ["p2", "p3", "p4", "p5"]
        for lvl, name in enumerate(names):
            v = fpn_op(feats[lvl], lvl, "")
            g = fpn_op(gfeats[lvl], lvl, "grid_")
            if cfg.merge_type == "Sum":
                out[name] = v + g
            else:  # Concat with adapter fcs (FeatureMerge.py:96-105)
                va = nn.relu(nn.Dense(cfg.fpn_dim, dtype=p.compute_dtype,
                                      param_dtype=p.param_dtype,
                                      name=f"vis_proj_{lvl}")(v))
                ga = nn.relu(nn.Dense(cfg.fpn_dim, dtype=p.compute_dtype,
                                      param_dtype=p.param_dtype,
                                      name=f"text_proj_{lvl}")(g))
                out[name] = nn.Dense(cfg.fpn_dim, dtype=p.compute_dtype,
                                     param_dtype=p.param_dtype,
                                     name=f"alpha_proj_{lvl}")(
                    jnp.concatenate([va, ga], -1))
        return out


class VGTDetector(nn.Module):
    """Fused pyramid → CenterNet-style layout detection (TPU-native head;
    see module docstring for the Cascade-R-CNN divergence note)."""

    config: VGTConfig = VGTConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, grid_ids, deterministic: bool = True):
        cfg = self.config
        p = self.policy
        pyr = VGTBackbone(cfg, policy=p, name="backbone")(images, grid_ids,
                                                          deterministic)
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

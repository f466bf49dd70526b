"""LORE-TSR: table structure recognition (TPU-native).

Behavioral parity target (reference: DocumentUnderstanding/LORE-TSR/src):
- DLA-34(+DCN) CenterNet heads {hm:2, st:8, wh:8, ax:256, cr:256, reg:2}
  (opts.py:403).
- Device decode: heatmap peaks → top-K cells → 4-point boxes; corner
  heatmap decode refines grouping (decode.py:54,:79).
- `Processor` (classifier.py:51): cell features (ax + summed 4-corner cr
  features) + x/y position embeddings of the box extremes → pre-LN-free
  vendored transformer (transformer.py:48: linear → N encoder layers
  [Norm/MHA/FF, residual] → 2-layer ReLU decoder) → 4 logical coordinates
  (row_start, row_end, col_start, col_end). Optional `Stacker`
  (classifier.py:22) refines with a second transformer conditioned on the
  first prediction.
- Losses (losses.py): CornerNet focal (hm) :10, RegL1 (wh/st/reg) :97,
  AxisLoss (logical coords L1 /4) :54, PairLoss :109.
- Eval metrics: bbox P/R/F1 at IoU + logical-location accuracy
  (eval_utils.py:79,:116).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.dla import DLASeg, DLASegConfig
from advancedliteratemachinery_tpu.ops.heatmap import (
    corner_decode,
    ctdet_4ps_decode,
    gather_feat,
    sigmoid_clamped,
)


class LoreEncoderLayer(nn.Module):
    """Vendored-transformer encoder layer (transformer.py:98-258):
    x + attn(norm(x)); x + ff(norm(x)) with torch-style std-norm."""

    dim: int
    heads: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        p = self.policy

        def stdnorm(h, name):
            # reference Norm (transformer.py:98): (x-mean)/std (Bessel) — not LN
            alpha = self.param(f"{name}_alpha", nn.initializers.ones, (self.dim,),
                               p.param_dtype)
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (self.dim,),
                              p.param_dtype)
            mu = jnp.mean(h, axis=-1, keepdims=True)
            sd = jnp.std(h, axis=-1, keepdims=True, ddof=1)
            return alpha * (h - mu) / (sd + 1e-6) + bias

        h = stdnorm(x.astype(jnp.float32), "norm1").astype(p.compute_dtype)
        B, T, C = h.shape
        hd = C // self.heads
        q = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype, name="q")(h)
        k = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype, name="k")(h)
        v = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype, name="v")(h)
        q = q.reshape(B, T, self.heads, hd)
        k = k.reshape(B, T, self.heads, hd)
        v = v.reshape(B, T, self.heads, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / (hd ** 0.5)
        if mask is not None:
            # mask [B, T] → pairwise valid (transformer.py:117-123)
            m2d = mask[:, None, :, None] * mask[:, None, None, :]
            scores = jnp.where(m2d > 0, scores, -1e9)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, C)
        o = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype, name="out")(o)
        x = x + o

        h = stdnorm(x.astype(jnp.float32), "norm2").astype(p.compute_dtype)
        h = nn.Dense(2048, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff1")(h)
        h = nn.relu(h)
        h = nn.Dense(C, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="ff2")(h)
        return x + h


class LoreTransformer(nn.Module):
    """linear → N encoder layers → 2-layer ReLU decoder (transformer.py:48).

    NOTE: no norm after the encoder stack — the reference Encoder
    constructs `self.norm` but its forward never applies it
    (transformer.py:18-31), and PositionalEncoder is likewise dead code."""

    hidden: int
    out_dim: int
    layers: int
    heads: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        p = self.policy
        x = nn.Dense(self.hidden, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="in_proj")(x)
        for i in range(self.layers):
            x = LoreEncoderLayer(self.hidden, self.heads, policy=p,
                                 name=f"layer_{i}")(x, mask, deterministic)
        x = nn.Dense(self.hidden, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="dec1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="dec2")(x)
        return nn.relu(x).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class LoreConfig(ConfigBase):
    backbone: DLASegConfig = DLASegConfig()
    input_size: int = 256        # cell feature dim (== ax/cr head dim)
    hidden_size: int = 256
    output_size: int = 4         # logical coords
    tsfm_layers: int = 4         # reference default 6; 4 in release scripts
    stacking_layers: int = 4
    num_heads: int = 8
    max_fmp_size: int = 256
    wiz_2dpe: bool = True
    wiz_stacking: bool = True
    top_k: int = 100             # cell detections
    corner_k: int = 400


class LoreProcessor(nn.Module):
    """Logical location regression over detected-cell features
    (classifier.py:51)."""

    config: LoreConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, feat, boxes=None, mask=None, deterministic: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        """feat [B,K,D] cell features (ax + corner-sum); boxes [B,K,8]
        4-point boxes on the feature map (for 2D position embeddings).
        Returns logic [B,K,4] (+ stacked_logic if wiz_stacking)."""
        cfg = self.config
        p = self.policy
        if feat.shape[-1] != cfg.hidden_size:
            raise ValueError(
                f"LoreProcessor: cell-feature dim {feat.shape[-1]} must equal "
                f"hidden_size {cfg.hidden_size} (the reference ties "
                f"input_size == hidden_size == 256, classifier.py:51); "
                f"position embeddings add directly onto the features")
        if cfg.wiz_2dpe and boxes is not None:
            ps = jnp.clip(jnp.round(boxes), 0, cfg.max_fmp_size - 1).astype(jnp.int32)
            xe = nn.Embed(cfg.max_fmp_size, cfg.hidden_size, param_dtype=p.param_dtype,
                          name="x_pe")
            ye = nn.Embed(cfg.max_fmp_size, cfg.hidden_size, param_dtype=p.param_dtype,
                          name="y_pe")
            feat = (feat + xe(ps[:, :, 0]) + ye(ps[:, :, 1])
                    + xe(ps[:, :, 2]) + ye(ps[:, :, 5]))

        logic = LoreTransformer(cfg.hidden_size, cfg.output_size, cfg.tsfm_layers,
                                cfg.num_heads, policy=p, name="tsfm_axis")(
            feat, mask, deterministic)
        out = {"logic": logic}
        if cfg.wiz_stacking:
            # Stacker (classifier.py:22): embed first prediction, concat, regress
            h = nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                         param_dtype=p.param_dtype, name="logi_enc1")(logic)
            h = nn.relu(h)
            h = nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                         param_dtype=p.param_dtype, name="logi_enc2")(h)
            h = nn.relu(h)
            cat = jnp.concatenate([h, feat.astype(h.dtype)], axis=-1)
            stacked = LoreTransformer(cfg.hidden_size, cfg.output_size,
                                      cfg.stacking_layers, cfg.num_heads, policy=p,
                                      name="stacker_tsfm")(cat, mask, deterministic)
            out["stacked_logic"] = stacked
        return out


@MODELS.register("lore")
class LORE(nn.Module):
    """End-to-end: DLASeg heads; at eval, device-side decode + Processor."""

    config: LoreConfig = LoreConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        self.backbone = DLASeg(self.config.backbone, policy=self.policy)
        self.processor = LoreProcessor(self.config, policy=self.policy)

    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        """Raw head maps (training path; decode/processor wired by callers).

        NOTE: this path never touches the processor, so ``model.init`` via
        the default __call__ yields a param tree without processor weights
        and a later ``infer`` fails — init with ``method=LORE.infer`` (or
        train_logic) instead."""
        return self.backbone(images, train=train)

    def infer(self, images) -> Dict[str, jnp.ndarray]:
        """Full inference: heads → sigmoid hm → decode → processor
        (base_detector.py:180 run / ctdet.py:41 process)."""
        cfg = self.config
        out = self.backbone(images, train=False)
        hm = sigmoid_clamped(out["hm"][..., 0:1])
        mk = sigmoid_clamped(out["hm"][..., 1:2]) if out["hm"].shape[-1] > 1 else None

        dec = ctdet_4ps_decode(hm, out["wh"], out["ax"], out["cr"],
                               reg=out.get("reg"), k=cfg.top_k)
        corners = (corner_decode(mk, out["st"], out.get("reg"), k=cfg.corner_k)
                   if mk is not None else None)

        feat = dec["ax_feat"] + dec["cr_feat"]
        boxes = dec["detections"][..., :8]
        logic = self.processor(feat, boxes, deterministic=True)

        res = {
            "detections": dec["detections"],
            "logic": logic.get("stacked_logic", logic["logic"]),
            "raw_logic": logic["logic"],
            "scores": dec["scores"],
        }
        if corners is not None:
            res["corners"] = corners["gboxes"]
            res["corner_scores"] = corners["scores"]
        return res

    def init_full(self, rng, image_shape: Tuple[int, int] = (512, 512)):
        """Initialize the COMPLETE variable tree (backbone + processor).

        The default ``__call__`` never touches the processor, so a plain
        ``model.init(rng, images)`` silently yields a params tree that makes
        a later ``infer``/``train_logic`` fail with a missing-submodule
        error. Always init through this helper:

            model = LORE(cfg)
            variables = model.init_full(jax.random.PRNGKey(0))
        """
        h, w = image_shape
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        return self.init(rng, x, method=LORE.infer)

    def train_logic(self, images, ct_inds, ct_mask, gt_boxes=None
                    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Training path for the processor: gather ax features at GT center
        indices (classifier.py:94-118 training mode)."""
        out = self.backbone(images, train=True)
        ax_feat = gather_feat(out["ax"], ct_inds)
        logic = self.processor(ax_feat, gt_boxes, mask=ct_mask, deterministic=False)
        return out, logic


# ---------------- losses (losses.py) ----------------


def focal_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """CornerNet modified focal loss (losses.py:10). pred in (0,1)."""
    pos = (gt == 1.0).astype(jnp.float32)
    neg = 1.0 - pos
    neg_w = (1.0 - gt) ** 4
    pos_loss = jnp.log(pred) * (1 - pred) ** 2 * pos
    neg_loss = jnp.log(1 - pred) * pred ** 2 * neg_w * neg
    num_pos = jnp.sum(pos)
    total = jnp.sum(pos_loss) + jnp.sum(neg_loss)
    return jnp.where(num_pos == 0, -jnp.sum(neg_loss), -total / jnp.maximum(num_pos, 1.0))


def reg_l1_loss(pred: jnp.ndarray, mask: jnp.ndarray, target: jnp.ndarray
                ) -> jnp.ndarray:
    """Masked L1 over gathered regressions (losses.py:97). pred/target
    [B,K,D], mask [B,K]. Denominator counts mask elements expanded over D
    (matching the reference's `mask.expand_as(pred).sum()`)."""
    m = jnp.broadcast_to(mask[..., None].astype(jnp.float32), pred.shape)
    loss = jnp.sum(jnp.abs(pred * m - target * m))
    return loss / (jnp.sum(m) + 1e-4)


def axis_loss(pred: jnp.ndarray, mask: jnp.ndarray, target: jnp.ndarray
              ) -> jnp.ndarray:
    """Logical-coordinate L1 / 4 (losses.py:54)."""
    m = mask[..., None].astype(jnp.float32)
    loss = jnp.sum(jnp.abs(pred * m - target * m))
    return loss / (4 * (jnp.sum(m) + 1e-4))


def make_table_predict_fn(model: "LORE", variables, input_size: int = 512,
                          down_ratio: int = 4, score_thresh: float = 0.3):
    """→ predict_fn(image_u8) for pipelines.modules.TableStructureRecognition
    (the DocXChain table module shape: {'polygons' [N,8], 'logi_coords'
    [N,4]}); mirrors base_detector.py:180 run → post_process coordinate
    back-mapping (affine resize inverse) with jitted device decode."""
    import cv2
    import jax as _jax

    infer = _jax.jit(lambda v, x: model.apply(v, x, method=model.infer))

    def predict(image_u8):
        h, w = image_u8.shape[:2]
        x = cv2.resize(image_u8, (input_size, input_size)).astype(np.float32)
        x = x / 255.0
        out = infer(variables, jnp.asarray(x[None]))
        det = np.asarray(out["detections"])[0]
        scores = np.asarray(out["scores"])[0]
        logic = np.rint(np.asarray(out["logic"])[0]).astype(np.int32)
        keep = scores > score_thresh
        polys = det[keep, :8] * down_ratio
        polys = polys * np.tile([w / input_size, h / input_size], 4)
        return {"polygons": polys.astype(np.float32),
                "logi_coords": logic[keep]}

    return predict


# ---------------- host-side training target generation ----------------


def gaussian_radius(det_size: Tuple[float, float],
                    min_overlap: float = 0.7) -> float:
    """CornerNet radius heuristic (reference src/lib/utils/image.py
    gaussian_radius — the min of the three quadratic solutions)."""
    height, width = det_size
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(max(b1 ** 2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(max(b2 ** 2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(max(b3 ** 2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / 2
    return max(0.0, min(r1, r2, r3))


def draw_gaussian(heatmap: np.ndarray, center, radius: int) -> None:
    """Splat an unnormalized 2D gaussian (image.py draw_umich_gaussian)."""
    diameter = 2 * radius + 1
    sigma = diameter / 6
    y, x = np.ogrid[-radius: radius + 1, -radius: radius + 1]
    gaussian = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    cx, cy = int(center[0]), int(center[1])
    H, W = heatmap.shape
    left, right = min(cx, radius), min(W - cx, radius + 1)
    top, bottom = min(cy, radius), min(H - cy, radius + 1)
    if right + left <= 0 or top + bottom <= 0:
        return
    masked = heatmap[cy - top: cy + bottom, cx - left: cx + right]
    g = gaussian[radius - top: radius + bottom,
                 radius - left: radius + right]
    np.maximum(masked, g, out=masked)


def lore_targets(cells, logic_axes, hw: Tuple[int, int],
                 down_ratio: int = 4, max_cells: int = 128
                 ) -> Dict[str, np.ndarray]:
    """LORE CenterNet training targets (reference
    src/lib/datasets/sample/ctdet.py label generation):

    - hm [H/4, W/4, 2]: gaussian peaks at cell centers (ch 0) and at the
      four cell corners (ch 1);
    - wh_target [K, 8]: corner offsets from the (integer) center;
    - ct_inds/ct_mask [K]: flat center indices into the output grid;
    - logic_target [K, 4]: row/col start/end;
    - gt_boxes [K, 8]: output-resolution corner coords (Processor input).

    cells: [N, 4, 2] page-coordinate corner arrays; logic_axes: [N, 4].
    """
    H, W = hw
    ho, wo = H // down_ratio, W // down_ratio
    hm = np.zeros((ho, wo, 2), np.float32)
    wh = np.zeros((max_cells, 8), np.float32)
    inds = np.zeros((max_cells,), np.int32)
    mask = np.zeros((max_cells,), np.float32)
    logic = np.zeros((max_cells, 4), np.float32)
    boxes = np.zeros((max_cells, 8), np.float32)
    for k, cell in enumerate(cells[:max_cells]):
        c = np.asarray(cell, np.float32).reshape(4, 2) / down_ratio
        ct = c.mean(axis=0)
        cti = np.floor(ct).astype(np.int32)
        if not (0 <= cti[0] < wo and 0 <= cti[1] < ho):
            continue
        h_box = float(c[:, 1].max() - c[:, 1].min())
        w_box = float(c[:, 0].max() - c[:, 0].min())
        radius = max(0, int(gaussian_radius((np.ceil(h_box),
                                             np.ceil(w_box)))))
        draw_gaussian(hm[..., 0], cti, radius)
        for corner in c:
            ci = np.floor(corner).astype(np.int32)
            if 0 <= ci[0] < wo and 0 <= ci[1] < ho:
                draw_gaussian(hm[..., 1], ci, max(1, radius // 2))
        wh[k] = (c - ct[None]).reshape(-1)
        inds[k] = cti[1] * wo + cti[0]
        mask[k] = 1.0
        logic[k] = np.asarray(logic_axes[k], np.float32)
        boxes[k] = c.reshape(-1)
    return {"hm": hm, "wh_target": wh, "ct_inds": inds, "ct_mask": mask,
            "logic_target": logic, "gt_boxes": boxes}

"""DocXLayout: two-level document layout analysis (CenterNet, inference).

Behavioral parity target (reference DocumentUnderstanding/DocXLayout):
- DLA-v0 CenterNet (models/networks/dlav0_subfield.py: plain conv neck
  with concat-nodes, NO deformable conv — faithfully DLASegV0 in
  models/dla.py) with dual head groups — layout level {hm, cls(13),
  ftype, wh(8), reg(2)} and subfield level {hm_sub, wh_sub, reg_sub}
  (detectors/ctdet_subfield.py:26 process), both decoded with the
  4-point decode. The released DocXLayout_231012.pth maps onto this via
  engine/checkpoint.py import_docxlayout.
- Predictor output shape matches main.py:85 DocXLayoutPredictor.predict /
  wrapper.py:186 wrap_result: per-detection {category_id, poly, score},
  plus subfield dets; reading-order sorting lives in
  pipelines/document.py:sort_reading_order (wrapper.py:95).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.dla import (DLASegV0, DLASegConfig,
                                                      DLAConfig)
from advancedliteratemachinery_tpu.ops.heatmap import ctdet_4ps_decode, sigmoid_clamped


@dataclasses.dataclass(frozen=True)
class DocXLayoutConfig(ConfigBase):
    num_classes: int = 13
    num_secondary_classes: int = 3      # ftype
    top_k: int = 100
    top_k_sub: int = 20
    score_threshold: float = 0.3
    dla: DLAConfig = DLAConfig()
    head_conv: int = 256

    def seg_config(self) -> DLASegConfig:
        return DLASegConfig(
            dla=self.dla, head_conv=self.head_conv,
            heads=(
                ("hm", 1), ("cls", self.num_classes),
                ("ftype", self.num_secondary_classes),
                ("wh", 8), ("reg", 2),
                ("hm_sub", 1), ("wh_sub", 8), ("reg_sub", 2),
            ))


@MODELS.register("docxlayout")
class DocXLayout(nn.Module):
    config: DocXLayoutConfig = DocXLayoutConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        self.backbone = DLASegV0(self.config.seg_config(), policy=self.policy)

    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        return self.backbone(images, train=train)

    def infer(self, images) -> Dict[str, jnp.ndarray]:
        """→ layout dets [B,K,10], per-det class probs [B,K,C], subfield
        dets [B,Ks,10] (ctdet_subfield.py:58-90)."""
        cfg = self.config
        out = self.backbone(images, train=False)
        hm = sigmoid_clamped(out["hm"])
        cls = sigmoid_clamped(out["cls"])
        ftype = sigmoid_clamped(out["ftype"])
        hm_sub = sigmoid_clamped(out["hm_sub"])

        # main decode needs cr/ax placeholders (unused head here)
        zeros = jnp.zeros_like(out["wh"][..., :1])
        dec = ctdet_4ps_decode(hm, out["wh"], zeros, zeros, reg=out["reg"],
                               k=cfg.top_k)
        dec_sub = ctdet_4ps_decode(hm_sub, out["wh_sub"], zeros, zeros,
                                   reg=out["reg_sub"], k=cfg.top_k_sub)

        # per-detection class probabilities at the center cell
        from advancedliteratemachinery_tpu.ops.heatmap import gather_feat

        cls_probs = gather_feat(cls, dec["inds"])
        ftype_probs = gather_feat(ftype, dec["inds"])
        return {
            "detections": dec["detections"],
            "cls_probs": cls_probs,
            "ftype_probs": ftype_probs,
            "detections_sub": dec_sub["detections"],
        }


def make_layout_predict_fn(model: DocXLayout, variables, down_ratio: int = 4):
    """→ predict_fn(image_u8) for pipelines.modules.LayoutAnalysis."""
    infer = jax.jit(lambda v, x: model.apply(v, x, method=model.infer))

    def predict(image: np.ndarray):
        cfg = model.config
        x = jnp.asarray(image[None].astype(np.float32) / 255.0)
        out = infer(variables, x)
        dets = np.asarray(out["detections"][0])
        cls_probs = np.asarray(out["cls_probs"][0])
        keep = dets[:, 8] >= cfg.score_threshold
        quads = dets[keep, :8] * down_ratio
        scores = dets[keep, 8]
        cats = cls_probs[keep].argmax(-1)
        return quads, scores, cats

    return predict

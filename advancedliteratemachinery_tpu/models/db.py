"""DB (Differentiable Binarization) text detector.

Behavioral parity target: the line-level DB detector DocXChain consumes via
ModelScope (reference Applications/DocXChain/modules/text_detection.py:32
`pipeline(Tasks.ocr_detection, model='...reading...line-level_damo')` — a
ResNet-18 + FPN + DB head). The model itself isn't vendored in the
reference, so this follows the standard public DB architecture: ResNet-18
backbone → FPN (256) → per-level 64ch laterals concatenated at 1/4 →
probability head (conv + 2 deconvs → full-res sigmoid map); at train time a
threshold head + differentiable binarization b = 1/(1+exp(-k(p-t))).

Device side ends at the probability map; box extraction (connected
components → min-area quads → unclip) is host-side cv2 work, mirroring the
reference's host post-processing split.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS

BN_MOMENTUM = 0.9


class _S2DConv7x7s2(nn.Module):
    """7x7 stride-2 conv computed via space-to-depth, exactly.

    A few-channel stride-2 stem conv is the worst case for the TPU MXU
    (contraction dim 7*7*3, channel dim 3 padded to the 128-lane register
    width). Rewriting input [B,H,W,C] -> [B,H/2,W/2,4C] (2x2 blocks into
    channels) turns it into a DENSE 4x4 stride-1 conv with the identical
    function: O[i,j] = sum_{u,v} W[u,v] X[2i+u-3, 2j+v-3] and
    2i+u-3 = 2(i+a)+dr with (a+2, dr) = divmod(u+1, 2), so the 7x7 kernel
    scatters into a zero-padded (4,4,4C,F) kernel applied with padding
    (2,1). Same trick as the MLPerf TPU ResNet conv0. The parameter stays
    the canonical (7,7,C,F) nn.Conv kernel so checkpoint import paths are
    unchanged.
    """
    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        B, H, W_, C = x.shape
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, C, self.features), self.param_dtype).astype(self.dtype)
        # kernel: pad to (8,8), split each spatial dim into (tap, parity)
        k8 = jnp.pad(kern, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k8 = k8.reshape(4, 2, 4, 2, C, self.features)
        w2 = k8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C,
                                                    self.features)
        # input: 2x2 spatial blocks -> channels, matching (dr, ds, c) order
        x2 = x.reshape(B, H // 2, 2, W_ // 2, 2, C)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W_ // 2,
                                                    4 * C)
        return jax.lax.conv_general_dilated(
            x2, w2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBNRelu(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    relu: bool = True
    s2d: bool = False    # 7x7/s2 only: space-to-depth reparameterization
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        if self.s2d and self.kernel == (7, 7) and self.strides == (2, 2):
            x = _S2DConv7x7s2(self.features, dtype=p.compute_dtype,
                              param_dtype=p.param_dtype, name="conv")(x)
        else:
            # torch-style symmetric (k-1)//2 padding (flax SAME is
            # asymmetric at stride>1, shifting the grid vs torch
            # checkpoints — see MaskedConv)
            x = nn.Conv(self.features, self.kernel, self.strides,
                        padding=[((k - 1) // 2, (k - 1) // 2)
                                 for k in self.kernel],
                        use_bias=False, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="bn")(x).astype(p.compute_dtype)
        return nn.relu(x) if self.relu else x


class ResBlock(nn.Module):
    planes: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = x
        h = ConvBNRelu(self.planes, (3, 3), (self.stride, self.stride),
                       policy=self.policy, name="c1")(x, train)
        h = ConvBNRelu(self.planes, (3, 3), relu=False, policy=self.policy,
                       name="c2")(h, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            r = ConvBNRelu(self.planes, (1, 1), (self.stride, self.stride),
                           relu=False, policy=self.policy, name="down")(x, train)
        return nn.relu(h + r)


@dataclasses.dataclass(frozen=True)
class DBConfig(ConfigBase):
    width: int = 64           # resnet-18 base width
    fpn_dim: int = 256
    head_dim: int = 64
    k: float = 50.0           # binarization steepness
    stem_s2d: bool = True     # space-to-depth stem conv (exact, faster)


@MODELS.register("db_detector")
class DBDetector(nn.Module):
    config: DBConfig = DBConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        """images [B, H, W, 3] (H, W mult of 32) → prob map [B, H, W, 1]
        (+ thresh/binary maps at train time)."""
        cfg = self.config
        p = self.policy
        w = cfg.width
        x = ConvBNRelu(w, (7, 7), (2, 2), s2d=cfg.stem_s2d, policy=p,
                       name="stem")(images.astype(p.compute_dtype), train)
        # torch MaxPool2d(3, 2, padding=1): symmetric, unlike SAME at stride 2
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for s, (planes, stride) in enumerate([(w, 1), (2 * w, 2), (4 * w, 2), (8 * w, 2)]):
            for b in range(2):
                x = ResBlock(planes, stride if b == 0 else 1, policy=p,
                             name=f"layer{s}_{b}")(x, train)
            feats.append(x)   # strides 4, 8, 16, 32

        # FPN: top-down sum, each level → head_dim, upsample to 1/4, concat
        lat = [nn.Conv(cfg.fpn_dim, (1, 1), dtype=p.compute_dtype,
                       param_dtype=p.param_dtype, name=f"lat{i}")(f)
               for i, f in enumerate(feats)]
        for i in range(2, -1, -1):
            up = jax.image.resize(lat[i + 1], lat[i].shape, method="nearest")
            lat[i] = lat[i] + up
        outs = []
        ref_shape = lat[0].shape
        for i, l in enumerate(lat):
            o = nn.Conv(cfg.head_dim, (3, 3), padding="SAME", dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name=f"smooth{i}")(l)
            if o.shape != ref_shape:
                o = jax.image.resize(
                    o, (o.shape[0], ref_shape[1], ref_shape[2], cfg.head_dim),
                    method="nearest")
            outs.append(o)
        fuse = jnp.concatenate(outs, axis=-1)   # [B, H/4, W/4, 4*head_dim]

        def shuffle2(t):
            # nn.PixelShuffle(2) in NHWC: channel blocks (out, 2, 2)
            B_, H_, W_, C_ = t.shape
            o = C_ // 4
            t = t.reshape(B_, H_, W_, o, 2, 2)
            return t.transpose(0, 1, 4, 2, 5, 3).reshape(B_, H_ * 2,
                                                         W_ * 2, o)

        def head(name):
            """DBNet head: conv3x3+BN+relu → ConvTranspose(2,2)+BN+relu →
            ConvTranspose(2,2) → sigmoid. A 2x2-stride-2 transposed conv
            touches each input pixel exactly once, so it reparameterizes
            EXACTLY as a 1x1 conv to 4x channels + pixel shuffle — same
            function class, but the convs run at low resolution (the
            bilinear-resize formulation spent 16 of the model's 25 ms
            moving 64-channel maps at 320²/640², scripts/db_profile.py)."""
            h = ConvBNRelu(cfg.head_dim, (3, 3), policy=p,
                           name=f"{name}_c")(fuse, train)
            h = nn.Conv(cfg.head_dim * 4, (1, 1), dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name=f"{name}_up1")(h)
            h = shuffle2(h)                              # 1/4 → 1/2
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, dtype=jnp.float32,
                             param_dtype=p.param_dtype,
                             name=f"{name}_bn1")(h).astype(p.compute_dtype)
            h = nn.relu(h)
            h = nn.Conv(4, (1, 1), dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name=f"{name}_up2")(h)
            h = shuffle2(h)                              # 1/2 → full, 1ch
            return jax.nn.sigmoid(h.astype(jnp.float32))

        prob = head("prob")
        out = {"prob": prob}
        if train:
            thresh = head("thresh")
            out["thresh"] = thresh
            out["binary"] = jax.nn.sigmoid(cfg.k * (prob - thresh))
        return out


# ---------------- host-side box extraction ----------------


def extract_boxes(prob_map: np.ndarray, bin_thresh: float = 0.3,
                  box_thresh: float = 0.6, unclip_ratio: float = 1.5,
                  min_size: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """prob map [H, W] → (quads [N, 8] float32, scores [N]).

    Standard DB post-processing: binarize → contours → min-area rects,
    score = mean prob inside, unclip by area/perimeter offset (implemented
    with cv2 contour scaling — pyclipper isn't available; the offset
    distance matches the DB paper's A·r/L formula)."""
    import cv2

    binary = (prob_map > bin_thresh).astype(np.uint8)
    contours, _ = cv2.findContours(binary, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    quads: List[np.ndarray] = []
    scores: List[float] = []
    H, W = prob_map.shape
    for cnt in contours:
        if len(cnt) < 4:
            continue
        rect = cv2.minAreaRect(cnt)
        if min(rect[1]) < min_size:
            continue
        box = cv2.boxPoints(rect)
        mask = np.zeros((H, W), np.uint8)
        cv2.fillPoly(mask, [box.astype(np.int32)], 1)
        score = float((prob_map * mask).sum() / max(mask.sum(), 1))
        if score < box_thresh:
            continue
        # unclip: offset outward by A * r / L
        area = cv2.contourArea(box)
        length = cv2.arcLength(box, True)
        dist = area * unclip_ratio / max(length, 1e-6)
        center = box.mean(axis=0)
        vec = box - center
        norm = np.linalg.norm(vec, axis=1, keepdims=True) + 1e-6
        box = box + vec / norm * dist
        box[:, 0] = np.clip(box[:, 0], 0, W - 1)
        box[:, 1] = np.clip(box[:, 1], 0, H - 1)
        quads.append(box.reshape(-1).astype(np.float32))
        scores.append(score)
    if not quads:
        return np.zeros((0, 8), np.float32), np.zeros((0,), np.float32)
    order = np.argsort(scores)[::-1]
    return np.stack(quads)[order], np.asarray(scores, np.float32)[order]


# ---------------- host-side training target generation ----------------


def _offset_poly(poly: np.ndarray, dist: float) -> np.ndarray:
    """Offset a polygon outward (dist > 0) or inward along the
    center-to-vertex direction — the same approximation extract_boxes uses
    for unclipping (pyclipper-free)."""
    center = poly.mean(axis=0)
    vec = poly - center
    norm = np.linalg.norm(vec, axis=1, keepdims=True) + 1e-6
    return poly + vec / norm * dist


def db_targets(polys, hw: Tuple[int, int], shrink_ratio: float = 0.4,
               thresh_min: float = 0.3, thresh_max: float = 0.7
               ) -> Dict[str, np.ndarray]:
    """Standard DB training maps from text polygons (the DB paper's label
    generation, used by the ModelScope detector DocXChain wraps):

    - gt_prob:   polygons shrunk by offset d = A(1-r²)/L, filled 1;
    - gt_thresh: a border band between the shrunk and dilated polygons
                 ramping thresh_max (on the boundary) → thresh_min;
    - thresh_mask: 1 inside the dilated band (where the L1 thresh loss
                 applies).

    polys: iterable of [K, 2] float arrays (page coords); hw: (H, W).
    """
    import cv2

    H, W = hw
    gt_prob = np.zeros((H, W, 1), np.float32)
    thresh_canvas = np.zeros((H, W), np.float32)
    thresh_mask = np.zeros((H, W, 1), np.float32)
    for poly in polys:
        poly = np.asarray(poly, np.float32).reshape(-1, 2)
        if len(poly) < 3:
            continue
        area = cv2.contourArea(poly)
        length = cv2.arcLength(poly, True)
        if area < 1 or length < 1:
            continue
        d = area * (1 - shrink_ratio ** 2) / length
        shrunk = _offset_poly(poly, -d).astype(np.int32)
        cv2.fillPoly(gt_prob, [shrunk], 1.0)
        dilated = _offset_poly(poly, d).astype(np.int32)
        band = np.zeros((H, W), np.uint8)
        cv2.fillPoly(band, [dilated], 1)
        thresh_mask[band > 0] = 1.0
        # distance to the ORIGINAL polygon boundary, normalized by d
        edge = np.zeros((H, W), np.uint8)
        cv2.polylines(edge, [poly.astype(np.int32)], True, 1)
        dist = cv2.distanceTransform(1 - edge, cv2.DIST_L2, 3)
        ramp = np.clip(1.0 - dist / max(d, 1e-6), 0.0, 1.0) * band
        thresh_canvas = np.maximum(thresh_canvas, ramp)
    gt_thresh = (thresh_min
                 + (thresh_max - thresh_min) * thresh_canvas)[..., None]
    return {"gt_prob": gt_prob, "gt_thresh": gt_thresh.astype(np.float32),
            "thresh_mask": thresh_mask}

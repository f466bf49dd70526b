"""CenterNet-style heatmap decode ops, jit-safe with fixed K.

Replaces the reference's torch decode utilities
(LORE-TSR/src/lib/models/decode.py: `_nms` :13 maxpool peak keep,
`_topk` :34, `corner_decode` :54, `ctdet_4ps_decode` :79;
gather helpers src/lib/models/utils.py:31 `_gather_feat`,
`_get_4ps_feat` :49). Everything stays on device: top-K, 4-point box
assembly, corner-feature gathering — no host round trips
(the reference syncs explicitly at ctdet.py:78).

Layout: heatmaps are NHWC [B, H, W, C(lasses)].
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def heatmap_peaks(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima (3x3 by default): heat * (maxpool(heat)==heat)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return jnp.where(hmax == heat, heat, 0.0)


@partial(jax.jit, static_argnames=("k",))
def topk_peaks(heat: jnp.ndarray, k: int = 100):
    """Global top-K over classes+positions after per-class flatten
    (reference `_topk`, decode.py:34).

    Returns dict: scores [B,K], inds (flat y*W+x) [B,K], clses [B,K],
    ys [B,K], xs [B,K] (float, integer-valued)."""
    B, H, W, C = heat.shape
    flat = heat.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    cls_scores, cls_inds = jax.lax.top_k(flat, k)          # [B, C, K]
    scores, ind2 = jax.lax.top_k(cls_scores.reshape(B, C * k), k)
    clses = (ind2 // k).astype(jnp.int32)
    inds = jnp.take_along_axis(cls_inds.reshape(B, C * k), ind2, axis=1)
    ys = (inds // W).astype(jnp.float32)
    xs = (inds % W).astype(jnp.float32)
    return {"scores": scores, "inds": inds.astype(jnp.int32),
            "clses": clses, "ys": ys, "xs": xs}


def gather_feat(fmap: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """fmap [B,H,W,C], inds [B,K] flat spatial → [B,K,C]
    (reference `_tranpose_and_gather_feat`)."""
    B, H, W, C = fmap.shape
    flat = fmap.reshape(B, H * W, C)
    return jnp.take_along_axis(flat, inds[..., None].astype(jnp.int32), axis=1)


def corner_decode(mk: jnp.ndarray, st_reg: jnp.ndarray,
                  mk_reg: Optional[jnp.ndarray] = None, k: int = 400) -> Dict:
    """Corner-heatmap decode (decode.py:54): peaks → top-K → center offsets
    → 8-dof group boxes implied by each corner's st regression."""
    peaks = topk_peaks(heatmap_peaks(mk), k)
    xs, ys = peaks["xs"][..., None], peaks["ys"][..., None]
    if mk_reg is not None:
        reg = gather_feat(mk_reg, peaks["inds"])
        xs = xs + reg[:, :, 0:1]
        ys = ys + reg[:, :, 1:2]
    else:
        xs = xs + 0.5
        ys = ys + 0.5
    st = gather_feat(st_reg, peaks["inds"])               # [B,K,8]
    gboxes = jnp.concatenate(
        [xs - st[..., 0:1], ys - st[..., 1:2], xs - st[..., 2:3], ys - st[..., 3:4],
         xs - st[..., 4:5], ys - st[..., 5:6], xs - st[..., 6:7], ys - st[..., 7:8]],
        axis=2)
    return {"scores": peaks["scores"][..., None], "inds": peaks["inds"],
            "xs": xs, "ys": ys, "gboxes": gboxes}


def ctdet_4ps_decode(
    heat: jnp.ndarray,
    wh: jnp.ndarray,
    ax: jnp.ndarray,
    cr: jnp.ndarray,
    reg: Optional[jnp.ndarray] = None,
    k: int = 100,
) -> Dict:
    """Cell-center decode (decode.py:79, wiz_rev=False path): top-K centers,
    8-dof corner offsets → 4-point boxes, corner-feature sum for the logical
    processor.

    heat [B,H,W,Cc]; wh [B,H,W,8]; ax [B,H,W,Da]; cr [B,H,W,Dc];
    reg [B,H,W,2]. Returns detections [B,K,10] (8 pts, score, cls),
    cr_feat [B,K,Dc], ax_feat [B,K,Da], sorted by score."""
    B, H, W, _ = heat.shape
    peaks = topk_peaks(heatmap_peaks(heat), k)
    xs, ys = peaks["xs"][..., None], peaks["ys"][..., None]
    if reg is not None:
        r = gather_feat(reg, peaks["inds"])
        xs = xs + r[:, :, 0:1]
        ys = ys + r[:, :, 1:2]
    else:
        xs = xs + 0.5
        ys = ys + 0.5

    whk = gather_feat(wh, peaks["inds"])                  # [B,K,8]
    axk = gather_feat(ax, peaks["inds"])                  # [B,K,Da]

    bboxes = jnp.concatenate(
        [xs - whk[..., 0:1], ys - whk[..., 1:2], xs - whk[..., 2:3], ys - whk[..., 3:4],
         xs - whk[..., 4:5], ys - whk[..., 5:6], xs - whk[..., 6:7], ys - whk[..., 7:8]],
        axis=2)                                            # [B,K,8]

    # corner-feature gather: each predicted corner rounds to a grid cell,
    # its cr feature is summed over the 4 corners (decode.py:199-205)
    cc_x = bboxes[..., 0::2]
    cc_y = jnp.round(bboxes[..., 1::2])
    cc_match = jnp.round(cc_x + W * cc_y).astype(jnp.int32)   # [B,K,4]
    cc_match = jnp.clip(cc_match, 0, H * W - 1)
    cr_flat = cr.reshape(B, H * W, -1)
    crk = jax.vmap(lambda f, i: f[i])(cr_flat, cc_match.reshape(B, -1))
    cr_feat = crk.reshape(B, k, 4, -1).sum(axis=2)        # [B,K,Dc]

    detections = jnp.concatenate(
        [bboxes, peaks["scores"][..., None], peaks["clses"][..., None].astype(jnp.float32)],
        axis=2)
    return {"detections": detections, "cr_feat": cr_feat, "ax_feat": axk,
            "scores": peaks["scores"], "inds": peaks["inds"],
            "centers": jnp.concatenate([xs, ys], axis=2)}


def sigmoid_clamped(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Reference `_sigmoid` (utils.py:9): sigmoid clamped to [eps, 1-eps]."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)

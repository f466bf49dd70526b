"""Device-side NMS for 4-point (quadrilateral) boxes.

Replaces the reference's Cython/shapely NMS
(LORE-TSR/src/lib/external/nms.pyx — 391 LoC greedy/soft NMS;
LORE-TSR/src/lib/utils/shapelyNMS.py `pnms` — polygon IoU via shapely;
DocXLayout/external/nms.pyx): everything here is jit-compatible with
fixed K, so suppression runs on device instead of a host round trip.

Polygon IoU is computed exactly with a masked Sutherland–Hodgman clip:
slots that emit nothing repeat the previous emitted vertex, which leaves
the shoelace area unchanged — no dynamic compaction needed under XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-9


def shoelace_area(pts: jnp.ndarray) -> jnp.ndarray:
    """Signed area of a (cyclic, possibly duplicate-padded) polygon
    [..., V, 2]."""
    x, y = pts[..., 0], pts[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.sum(x * yn - xn * y, axis=-1)


def _clip_by_edge(pts: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One Sutherland–Hodgman pass: clip polygon `pts` [..., V, 2] by the
    half-plane left of directed edge a→b (each [..., 2]). Returns
    [..., 2V, 2] with fillers repeating the previous emitted vertex."""
    V = pts.shape[-2]
    prev = jnp.roll(pts, 1, axis=-2)

    def side(p):
        return ((b[..., None, 0] - a[..., None, 0]) * (p[..., 1] - a[..., None, 1])
                - (b[..., None, 1] - a[..., None, 1]) * (p[..., 0] - a[..., None, 0]))

    c_in = side(pts) >= 0          # [..., V]
    p_in = side(prev) >= 0

    # intersection of segment prev→pts with the edge line
    d1 = side(prev)
    d2 = side(pts)
    t = d1 / jnp.where(jnp.abs(d1 - d2) < EPS, EPS, d1 - d2)
    inter = prev + t[..., None] * (pts - prev)

    emit_inter = jnp.logical_xor(c_in, p_in)         # crossing → emit intersection
    emit_curr = c_in                                  # current inside → emit it

    # interleave [inter_0, cur_0, inter_1, cur_1, ...]
    cand = jnp.stack([inter, pts], axis=-2).reshape(*pts.shape[:-2], 2 * V, 2)
    valid = jnp.stack([emit_inter, emit_curr], axis=-1).reshape(*pts.shape[:-2], 2 * V)

    # fill invalid slots with the previous valid vertex (scan with carry)
    def fill(carry, xs):
        pt, ok = xs
        out = jnp.where(ok[..., None], pt, carry)
        return out, out

    # move the slot axis to the front for scan
    cand_t = jnp.moveaxis(cand, -2, 0)
    valid_t = jnp.moveaxis(valid, -1, 0)
    # two passes: the first recovers the LAST valid vertex (the polygon is
    # cyclic, so leading invalid slots must replicate it), the second fills
    last_valid, _ = jax.lax.scan(fill, jnp.zeros_like(cand_t[0]), (cand_t, valid_t))
    _, filled = jax.lax.scan(fill, last_valid, (cand_t, valid_t))
    filled = jnp.moveaxis(filled, 0, -2)
    # If a row had no valid slot at all the polygon is empty; zero it.
    any_valid = jnp.any(valid, axis=-1, keepdims=True)[..., None]
    return jnp.where(any_valid, filled, 0.0)


def quad_intersection_area(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Exact |q1 ∩ q2| for convex quads [..., 4, 2] (counter-clockwise)."""
    # 8 slots: the 4 real vertices + the last vertex repeated (duplicate
    # vertices are harmless for clipping and shoelace)
    pad = jnp.repeat(q1[..., -1:, :], 4, axis=-2)
    poly = jnp.concatenate([q1, pad], axis=-2)               # [..., 8, 2]
    for i in range(4):
        a = q2[..., i, :]
        b = q2[..., (i + 1) % 4, :]
        poly = _clip_by_edge(poly, a, b)
    return jnp.abs(shoelace_area(poly))


def _ccw(quad: jnp.ndarray) -> jnp.ndarray:
    """Orient quads counter-clockwise (positive shoelace)."""
    area = shoelace_area(quad)
    return jnp.where(area[..., None, None] < 0, quad[..., ::-1, :], quad)


def quad_iou(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """IoU of convex quads [..., 4, 2] (any vertex order; batch dims
    broadcast)."""
    q1, q2 = jnp.broadcast_arrays(q1, q2)
    q1 = _ccw(q1)
    q2 = _ccw(q2)
    inter = quad_intersection_area(q1, q2)
    a1 = jnp.abs(shoelace_area(q1))
    a2 = jnp.abs(shoelace_area(q2))
    return inter / jnp.maximum(a1 + a2 - inter, EPS)


@partial(jax.jit, static_argnames=())
def poly_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float = 0.3) -> jnp.ndarray:
    """Greedy NMS over 4-point boxes (reference shapelyNMS.pnms /
    nms.pyx greedy path). boxes [K, 8] (x1..y4, score-descending),
    scores [K] → keep mask [K] bool."""
    K = boxes.shape[0]
    quads = boxes.reshape(K, 4, 2)
    iou = quad_iou(quads[:, None], quads[None, :])       # [K, K]

    def body(i, keep):
        alive = keep[i]
        lower = jnp.arange(K) > i
        supp = alive & lower & (iou[i] > iou_threshold)
        return keep & ~supp

    keep = jax.lax.fori_loop(0, K, body, jnp.ones((K,), bool))
    return keep


def soft_nms_scores(boxes: jnp.ndarray, scores: jnp.ndarray,
                    sigma: float = 0.5, method: str = "gaussian") -> jnp.ndarray:
    """Soft-NMS (nms.pyx soft path): decay scores of overlapping
    lower-ranked boxes instead of removing them. Returns decayed scores."""
    K = boxes.shape[0]
    quads = boxes.reshape(K, 4, 2)
    iou = quad_iou(quads[:, None], quads[None, :])

    def body(i, s):
        lower = jnp.arange(K) > i
        if method == "gaussian":
            decay = jnp.exp(-(iou[i] ** 2) / sigma)
        else:
            decay = jnp.where(iou[i] > sigma, 1.0 - iou[i], 1.0)
        return jnp.where(lower, s * decay, s)

    return jax.lax.fori_loop(0, K, body, scores)


def box_iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned IoU matrix [N, N] for boxes [N, 4] (x1, y1, x2, y2)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def box_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float = 0.5
            ) -> jnp.ndarray:
    """Greedy axis-aligned NMS, jit-safe fixed shape: returns a bool keep
    mask [N] (torchvision.ops.nms semantics — iterate by descending score,
    suppress IoU > thr). Padding rows should carry score -inf."""
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = box_iou_matrix(b)

    def body(i, keep):
        sup = (iou[i] > iou_thr) & (jnp.arange(N) > i) & keep[i]
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, N, body, jnp.ones((N,), bool))
    keep = jnp.zeros((N,), bool).at[order].set(keep_sorted)
    return keep

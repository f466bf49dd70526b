"""SceneVTG region/content proposal pipeline (TRCG inference).

Behavioral parity target: AIGC/SceneVTG/TRCG/inference.py + bezier_utils.py
— the fine-tuned LLaVA proposes text regions as 16-number bezier layouts
(two cubic curves: 8 top + 8 bottom control coords) with text contents,
emitted as a python-literal list of {"layout": [...], "text": "..."} dicts.
Post-processing: parse the literal, drop one of each overlapping pair
(polygon IoU > 0.01), optionally split multi-word regions into per-word
sub-beziers by arclength proportional to word length (inference.py:220-290).

Everything here is host-side numpy (proposal parsing and geometry); the
model forward/generation is the jitted KV-cached path in models/trcg.py.
No shapely in this image: polygon intersection uses the framework's
Sutherland–Hodgman clip from ops/nms.py's geometry (re-implemented for
host numpy on arbitrary simple polygons via the shoelace/clipping pair).
"""

from __future__ import annotations

import ast
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_BEZIER_M = np.array([[-1, 3, -3, 1],
                      [3, -6, 3, 0],
                      [-3, 3, 0, 0],
                      [1, 0, 0, 0]], np.float64)


def bezier_fit_cubic(x: np.ndarray, y: np.ndarray) -> Optional[np.ndarray]:
    """Least-squares cubic-bezier control points [4, 2] through a polyline,
    chord-length parameterized (bezier_utils.py:5 bezier_fit_cubic)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    dt = np.hypot(np.diff(x), np.diff(y))
    if dt.sum() == 0:
        return None
    t = np.concatenate([[0], np.cumsum(dt / dt.sum())])
    T = np.stack([t ** 3, t ** 2, t, np.ones_like(t)], axis=1)
    data = np.column_stack([x, y])
    Minv = np.linalg.inv(_BEZIER_M)
    return Minv @ np.linalg.pinv(T.T @ T) @ T.T @ data


def bezier_points(cpts: Sequence[float], n: int = 20) -> np.ndarray:
    """Sample a cubic bezier given 8 flat control coords → [n, 2]
    (inference.py:30 generate_bezier_cubic)."""
    P = np.asarray(cpts, np.float64).reshape(4, 2)
    t = np.linspace(0.0, 1.0, n)
    T = np.stack([t ** 3, t ** 2, t, np.ones_like(t)], axis=1)
    return T @ _BEZIER_M @ P


def bezier_to_polygon(layout: Sequence[float], n: int = 20) -> np.ndarray:
    """16-coord layout (top curve 8 + bottom curve 8) → [2n, 2] polygon
    (inference.py:44: top samples then bottom samples, as given)."""
    top = bezier_points(layout[:8], n)
    bot = bezier_points(layout[8:], n)
    return np.concatenate([top, bot], axis=0)


def _polygon_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _clip_polygon(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of `subject` by CONVEX `clip` polygon."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

    def intersect(p1, p2, a, b):
        d1 = p2 - p1
        d2 = b - a
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-12:
            return p2
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
        return p1 + t * d1

    # ensure CCW clip polygon
    cx, cy = clip[:, 0], clip[:, 1]
    if np.dot(cx, np.roll(cy, -1)) - np.dot(cy, np.roll(cx, -1)) < 0:
        clip = clip[::-1]
    out = list(subject)
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        if not out:
            break
        inp, out = out, []
        prev = inp[-1]
        for cur in inp:
            if inside(cur, a, b):
                if not inside(prev, a, b):
                    out.append(intersect(prev, cur, a, b))
                out.append(cur)
            elif inside(prev, a, b):
                out.append(intersect(prev, cur, a, b))
            prev = cur
    return np.asarray(out) if out else np.zeros((0, 2))


def polygon_iou(p1: np.ndarray, p2: np.ndarray) -> float:
    """IoU via convex-hull clipping (the reference buffers shapely polygons
    by 0.01 to fix self-intersections — hulls are the robust analog)."""
    h1 = _convex_hull(p1)
    h2 = _convex_hull(p2)
    inter_poly = _clip_polygon(h1, h2)
    inter = _polygon_area(inter_poly) if len(inter_poly) >= 3 else 0.0
    a1, a2 = _polygon_area(h1), _polygon_area(h2)
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns CCW hull."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts) <= 2:
        return pts

    def cross2(a, b):
        return a[0] * b[1] - a[1] * b[0]

    def half(iterable):
        h = []
        for p in iterable:
            while len(h) >= 2 and cross2(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def overlay_indices(layouts: Sequence[Sequence[float]],
                    iou_thresh: float = 0.01) -> List[Tuple[int, int]]:
    """Pairs of proposal indices whose bezier polygons overlap
    (inference.py:63 overlay_indices)."""
    polys = [bezier_to_polygon(b) for b in layouts]
    out = []
    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            if polygon_iou(polys[i], polys[j]) > iou_thresh:
                out.append((i, j))
    return out


def parse_region_proposals(text: str) -> List[Dict]:
    """Parse the model's answer — a python-literal list of
    {"layout": [16 floats], "text": str} — tolerantly: strip the stop
    string, literal_eval (NOT eval: the reference inference.py:189 eval()
    executes model output as code), [] on any malformation."""
    s = text.replace("</s>", "").strip()
    if s.endswith("."):
        s = s[:-1]
    try:
        items = ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return []
    if not isinstance(items, list):
        return []
    out = []
    for it in items:
        if not isinstance(it, dict) or "layout" not in it or "text" not in it:
            continue
        try:
            layout = [float(v) for v in it["layout"]]
        except (TypeError, ValueError):
            continue
        if len(layout) != 16:
            continue
        out.append({"layout": layout, "text": str(it["text"])})
    return out


def filter_overlaps(proposals: List[Dict], iou_thresh: float = 0.01,
                    rng: Optional[np.random.Generator] = None) -> List[Dict]:
    """Drop one member of each overlapping pair (the reference picks at
    random, inference.py:199-205; deterministic seed by default)."""
    if rng is None:
        rng = np.random.default_rng(0)
    pairs = overlay_indices([p["layout"] for p in proposals], iou_thresh)
    skip = set()
    for i, j in pairs:
        if i not in skip and j not in skip:
            skip.add((i, j)[int(rng.integers(0, 2))])
    return [p for i, p in enumerate(proposals) if i not in skip]


def _split_curve_by_arclength(pts: np.ndarray, weights: Sequence[float]
                              ) -> List[np.ndarray]:
    """Split a sampled curve into len(weights) chunks whose arclengths are
    proportional to weights (inference.py:231-258 accumulation loop)."""
    seg = np.hypot(*np.diff(pts, axis=0).T)
    total = seg.sum()
    w = np.asarray(weights, np.float64)
    targets = np.cumsum(w / w.sum()) * total
    acc = np.concatenate([[0], np.cumsum(seg)])
    chunks = []
    start = 0
    for tgt in targets[:-1]:
        end = int(np.searchsorted(acc, tgt))
        end = max(end, start + 1)
        chunks.append(pts[start:end + 1])
        start = end
    chunks.append(pts[start:])
    return chunks


def split_words(layout: Sequence[float], text: str, samples: int = 100
                ) -> List[Tuple[List[float], str]]:
    """Split a multi-word region into per-word sub-beziers by arclength
    proportional to word length, with inter-word gaps of one character
    (inference.py with_word branch). Returns [(16-coord layout, word)]."""
    words = text.split(" ")
    if len(words) <= 1:
        return [(list(layout), text)]
    # weights: word lengths interleaved with 1-char gaps
    weights: List[float] = []
    for wd in words:
        weights.append(max(len(wd), 1))
        weights.append(1.0)
    weights = weights[:-1]

    top = bezier_points(layout[:8], samples)
    bot = bezier_points(layout[8:], samples)[::-1]   # reference reverses
    top_chunks = _split_curve_by_arclength(top, weights)
    bot_chunks = _split_curve_by_arclength(bot, weights)

    out = []
    for i, wd in enumerate(words):
        tc = top_chunks[2 * i]
        bc = bot_chunks[2 * i]
        ct = bezier_fit_cubic(tc[:, 0], tc[:, 1])
        cb = bezier_fit_cubic(bc[::-1, 0], bc[::-1, 1])
        if ct is None or cb is None:
            continue
        out.append((list(ct.reshape(-1)) + list(cb.reshape(-1)), wd))
    return out


class SceneVTGProposer:
    """TRCG proposal stage: image → [(bezier layout, text)].

    `generate_fn(images, input_ids) -> [B, T] token ids` is the injected
    jitted generation (models/trcg.py trcg_generate partial);
    `tokenizer` must provide encode(str)->ids and decode(ids)->str. The
    two-turn protocol mirrors inference.py:145-188: question 1 asks for
    regions, question 2 for the literal list of layout+text dicts."""

    def __init__(self, generate_fn, tokenizer, with_word: bool = False,
                 iou_thresh: float = 0.01):
        self.generate_fn = generate_fn
        self.tokenizer = tokenizer
        self.with_word = with_word
        self.iou_thresh = iou_thresh

    def __call__(self, image, questions: Sequence[str]) -> List[Dict]:
        import jax.numpy as jnp

        history = ""
        answers = []
        for q in questions:
            prompt = history + f"USER: {q} ASSISTANT:"
            ids = jnp.asarray([self.tokenizer.encode(prompt)])
            out = self.generate_fn(jnp.asarray(image)[None], ids)
            ans = self.tokenizer.decode(np.asarray(out)[0].tolist())
            answers.append(ans)
            history = prompt + " " + ans + " "
        proposals = parse_region_proposals(answers[-1])
        proposals = filter_overlaps(proposals, self.iou_thresh)
        if not self.with_word:
            return proposals
        out = []
        for p in proposals:
            for layout, word in split_words(p["layout"], p["text"]):
                out.append({"layout": layout, "text": word})
        return out


def rasterize_polygon_mask(poly: np.ndarray, hw: Tuple[int, int]
                           ) -> np.ndarray:
    """[N,2] polygon → float {0,1} mask [H, W] (PIL fill — the host-side
    analog of the reference's cv2.fillPoly mask building)."""
    from PIL import Image as _Image, ImageDraw

    m = _Image.new("L", (hw[1], hw[0]), 0)
    ImageDraw.Draw(m).polygon([(float(x), float(y)) for x, y in poly],
                              fill=255)
    return np.asarray(m, np.float32) / 255.0


def render_text_template(text: str, hw: Tuple[int, int]) -> np.ndarray:
    """Glyph-layout condition image [H, W, 3] in [0,1]: white text on
    black, stretched to the region (the LVTR `images_render` conditioning
    channel; the reference renders with a font file — PIL's built-in
    bitmap font keeps this asset-free)."""
    from PIL import Image as _Image, ImageDraw

    canvas = _Image.new("L", (max(len(text) * 6, 1), 11), 0)
    ImageDraw.Draw(canvas).text((0, 0), text, fill=255)
    canvas = canvas.resize((hw[1], hw[0]), _Image.BILINEAR)
    a = np.asarray(canvas, np.float32) / 255.0
    return np.repeat(a[..., None], 3, axis=2)


class SceneVTGPipeline:
    """Full two-stage SceneVTG: TRCG region/content proposals → LVTR
    diffusion rendering per region → composite (the reference runs
    TRCG/inference.py then LVTR sampling over its outputs).

    `proposer(image, questions) -> [{"layout", "text"}]` is a
    SceneVTGProposer; `render_fn(conditions) -> [1, h, w, 3]` is the
    injected jitted LVTR DDIM sampler; `encode_text(text) -> [L] ids`
    maps contents into the renderer's charset.
    """

    def __init__(self, proposer, render_fn, encode_text,
                 region_hw: Tuple[int, int] = (64, 256)):
        self.proposer = proposer
        self.render_fn = render_fn
        self.encode_text = encode_text
        self.region_hw = region_hw

    def __call__(self, image: np.ndarray, questions) -> Dict:
        import cv2

        H, W = image.shape[:2]
        proposals = self.proposer(image, questions)
        out = np.asarray(image, np.float32).copy()
        if out.max() > 1.5:
            out = out / 255.0
        rendered = []
        rh, rw = self.region_hw
        for prop in proposals:
            poly = bezier_to_polygon(prop["layout"])
            x0 = int(np.clip(poly[:, 0].min(), 0, W - 2))
            x1 = int(np.clip(poly[:, 0].max(), x0 + 1, W))
            y0 = int(np.clip(poly[:, 1].min(), 0, H - 2))
            y1 = int(np.clip(poly[:, 1].max(), y0 + 1, H))
            crop = out[y0:y1, x0:x1]
            style = cv2.resize(crop, (rw, rh))
            local = poly - np.asarray([[x0, y0]], np.float64)
            scale = np.asarray([[rw / (x1 - x0), rh / (y1 - y0)]])
            mask = rasterize_polygon_mask(local * scale, (rh, rw))[..., None]
            removal = style * (1 - mask) + style.mean(axis=(0, 1)) * mask
            conditions = {
                "images_style": style[None],
                "images_removal": removal[None],
                "images_render": render_text_template(prop["text"],
                                                      (rh, rw))[None],
                "line_poly_mask": mask[None],
                "word_poly_mask": mask[None],
                "text_ids": np.asarray([self.encode_text(prop["text"])],
                                       np.int32),
            }
            patch = np.asarray(self.render_fn(conditions))[0]
            patch = cv2.resize(patch, (x1 - x0, y1 - y0))
            m = rasterize_polygon_mask(local, (y1 - y0, x1 - x0))[..., None]
            out[y0:y1, x0:x1] = out[y0:y1, x0:x1] * (1 - m) + patch * m
            rendered.append({"text": prop["text"], "bbox": [x0, y0, x1, y1]})
        return {"image": out, "regions": rendered}

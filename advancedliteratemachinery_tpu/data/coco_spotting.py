"""COCO-format text-spotting dataset with Bezier center points.

Parity target: OmniParser's TextSpottingDataset
(reference OCR/OmniParser/dataset/text_spotting.py:11 — COCO json with
per-annotation `rec` (tokenized content), `bezier_pts` (16 floats, two
4-point cubic Beziers for the top and bottom curves), `polys`;
sample_pts :20 — the point prompt is the midpoint of the two curves'
midpoints). Sequence construction follows engine/val.py:25-31 prompts and
the coordinate-bin quantization in codecs/coords.py.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from advancedliteratemachinery_tpu.codecs.coords import CoordSeqVocab


def sample_bezier_curve(ctrl: np.ndarray, n: int = 10,
                        mid_point: bool = False) -> np.ndarray:
    """Cubic Bezier sampling; ctrl [4, 2]. mid_point → the t=0.5 point."""
    t = np.asarray([0.5]) if mid_point else np.linspace(0, 1, n)
    c = np.asarray(ctrl, np.float64)
    pts = ((1 - t) ** 3)[:, None] * c[0] \
        + (3 * (1 - t) ** 2 * t)[:, None] * c[1] \
        + (3 * (1 - t) * t ** 2)[:, None] * c[2] \
        + (t ** 3)[:, None] * c[3]
    return pts[0] if mid_point else pts


def bezier_center_points(bezier_pts: np.ndarray) -> np.ndarray:
    """[N, 16] → [N, 2] center points (text_spotting.py:20 sample_pts)."""
    out = []
    for bp in np.asarray(bezier_pts, np.float64).reshape(-1, 16):
        b = bp.reshape(8, 2)
        m1 = sample_bezier_curve(b[:4], mid_point=True)
        m2 = sample_bezier_curve(b[4:], mid_point=True)
        out.append((m1 + m2) / 2.0)
    return np.asarray(out) if out else np.zeros((0, 2))


def bezier_polygon(bezier_pts: np.ndarray, pts_per_side: int = 8) -> np.ndarray:
    """[16] → polygon [2*pts_per_side, 2]: top curve samples + reversed
    bottom curve samples."""
    b = np.asarray(bezier_pts, np.float64).reshape(8, 2)
    top = sample_bezier_curve(b[:4], n=pts_per_side)
    bottom = sample_bezier_curve(b[4:], n=pts_per_side)
    return np.concatenate([top, bottom], axis=0)


class CocoSpottingDataset:
    """COCO json reader for text spotting (no pycocotools needed)."""

    def __init__(self, image_folder: str, anno_file: str,
                 rec_length: int = 25):
        self.image_folder = image_folder
        self.rec_length = rec_length
        with open(anno_file) as f:
            coco = json.load(f)
        self.images = {img["id"]: img for img in coco["images"]}
        self.anns_by_image: Dict[int, List[dict]] = {}
        for ann in coco["annotations"]:
            if ann.get("iscrowd", 0):
                continue
            self.anns_by_image.setdefault(ann["image_id"], []).append(ann)
        self.ids = sorted(self.images)

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, idx: int) -> Dict:
        img_id = self.ids[idx]
        info = self.images[img_id]
        anns = self.anns_by_image.get(img_id, [])
        bezier = np.asarray([a["bezier_pts"] for a in anns],
                            np.float32).reshape(-1, 16)
        recs = np.asarray([a["rec"][: self.rec_length] for a in anns],
                          np.int64).reshape(-1, self.rec_length) \
            if anns else np.zeros((0, self.rec_length), np.int64)
        return {
            "image_id": img_id,
            "file_name": info["file_name"],
            "image_folder": self.image_folder,
            "orig_size": (info["height"], info["width"]),
            "bezier_pts": bezier,
            "center_pts": bezier_center_points(bezier),
            "recog": recs,
        }


def build_spotting_sequences(sample: Dict, vocab: CoordSeqVocab,
                             max_pts: int = 64, poly_pts: int = 16
                             ) -> Dict[str, np.ndarray]:
    """Training target sequences (the teacher-forced inputs/outputs the
    OmniParser recipe consumes): point seq = quantized center points + EOS,
    per-instance polygon and rec seqs with their SOS tokens."""
    h, w = sample["orig_size"]
    centers = sample["center_pts"][:max_pts]
    n = len(centers)
    cx = vocab.quantize(centers[:, 0], w) if n else np.zeros(0, np.int64)
    cy = vocab.quantize(centers[:, 1], h) if n else np.zeros(0, np.int64)
    pt_seq = np.empty(2 * n + 1, np.int64)
    pt_seq[0:2 * n:2] = cx
    pt_seq[1:2 * n + 1:2] = cy
    pt_seq[-1] = vocab.pt_eos_index

    polys = []
    for bp in sample["bezier_pts"][:max_pts]:
        poly = bezier_polygon(bp, pts_per_side=poly_pts // 2)
        q = np.stack([vocab.quantize(poly[:, 0], w),
                      vocab.quantize(poly[:, 1], h)], axis=1).reshape(-1)
        polys.append(q)
    return {
        "pt_seq": pt_seq,
        "poly_seqs": np.asarray(polys, np.int64) if polys
        else np.zeros((0, 2 * poly_pts), np.int64),
        "rec_seqs": sample["recog"][:max_pts],
    }


def spatial_window_prompt(rng, pts: np.ndarray, n_bins: int = 1000,
                          global_prob: float = 0.4):
    """Training-time spatial window prompt + point filter (reference
    collate_fn.py:46 get_spatial_window_prompt): 40% full window, 30% a
    cell of a fixed grid partition, 30% a random rectangle. pts [N,2] bin
    coords; a point is kept when start < p <= end on both axes."""
    prob = rng.uniform()
    if prob < global_prob:
        sx, sy, ex, ey = 0, 0, n_bins - 1, n_bins - 1
    elif prob < 0.7:
        num_xs = [3, 3, 1, 3, 2, 2, 2, 1]
        num_ys = [3, 1, 3, 2, 3, 2, 1, 2]
        windows = []
        for nx, ny in zip(num_xs, num_ys):
            ix = min(n_bins // nx, n_bins - 1)
            iy = min(n_bins // ny, n_bins - 1)
            for i in range(nx):
                for j in range(ny):
                    windows.append([i * ix, j * iy,
                                    min(i * ix + ix, n_bins - 1),
                                    min(j * iy + iy, n_bins - 1)])
        sx, sy, ex, ey = windows[int(rng.integers(0, len(windows)))]
    else:
        inter = n_bins // 3
        sx = int(rng.integers(0, inter * 2 + 1))
        sy = int(rng.integers(0, inter * 2 + 1))
        rw = int(rng.integers(inter, n_bins))
        rh = int(rng.integers(inter, n_bins))
        ex, ey = min(sx + rw, n_bins - 1), min(sy + rh, n_bins - 1)
    if len(pts):
        valid = ((pts[:, 0] > sx) & (pts[:, 0] <= ex)
                 & (pts[:, 1] > sy) & (pts[:, 1] <= ey))
    else:
        valid = np.zeros(0, bool)
    return np.asarray([sx, sy, ex, ey], np.int64), valid


def char_window_prompt(rng, first_chars: np.ndarray, num_chars: int,
                       n_bins: int = 1000, global_prob: float = 0.4):
    """Character-range window prompt + instance filter (collate_fn.py:85):
    40% the full char range, else a random contiguous run of the sorted
    first characters. first_chars [N] raw char-class ids."""
    if len(first_chars):
        if rng.uniform() < global_prob:
            start, end = 0, num_chars
        else:
            chars = np.sort(first_chars)
            n = len(chars)
            min_num = int(rng.integers(min(3, n), n + 1))
            si = int(rng.integers(0, n - min_num + 1))
            start, end = int(chars[si]), int(chars[si + min_num - 1])
    else:
        start = int(rng.integers(0, num_chars + 1))
        end = int(rng.integers(start, num_chars + 1))
    valid = ((first_chars >= start) & (first_chars <= end)
             if len(first_chars) else np.zeros(0, bool))
    return np.asarray([start + n_bins, end + n_bins], np.int64), valid

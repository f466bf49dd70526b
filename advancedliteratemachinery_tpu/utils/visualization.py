"""Visualization utilities for pipeline outputs.

Parity target: reference Applications/DocXChain/utilities/visualization.py
(general_text_reading_visualization / table_parsing_visualization /
document structurization overlays) plus the per-model debug views (LISTER
test.py:117, OmniParser engine/val.py:53-60). All host-side cv2 drawing on
RGB uint8 arrays.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

# BGR-ish palette matching the reference's color choices; cycled per
# layout category
_QUAD_COLOR = (49, 125, 237)
_CELL_COLOR = (0, 225, 0)
_PALETTE = [
    (237, 125, 49), (49, 125, 237), (0, 180, 0), (200, 0, 200),
    (0, 180, 180), (180, 180, 0), (120, 60, 200), (60, 200, 120),
]


def _poly_pts(poly) -> np.ndarray:
    p = np.asarray(poly, np.float32).reshape(-1, 2)
    return p.astype(np.int32).reshape(-1, 1, 2)


def draw_quads(image: np.ndarray, quads: Sequence, texts: Optional[Sequence[str]] = None,
               color=_QUAD_COLOR, thickness: int = 2) -> np.ndarray:
    """Reference general_text_reading_visualization: closed polylines per
    quad, optional recognized text above the top-left corner."""
    import cv2

    out = np.ascontiguousarray(image.copy())
    for i, q in enumerate(quads):
        pts = _poly_pts(q)
        cv2.polylines(out, [pts], True, color, thickness)
        if texts is not None and i < len(texts) and texts[i]:
            x, y = int(pts[:, 0, 0].min()), int(pts[:, 0, 1].min())
            cv2.putText(out, str(texts[i]), (x, max(y - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1,
                        cv2.LINE_AA)
    return out


def draw_reading(image: np.ndarray, reading_result: Dict) -> np.ndarray:
    """`read` CLI / GeneralTextReading output ({"instances": [{"poly",
    "text", ...}]}) → overlay."""
    inst = reading_result.get("instances", [])
    return draw_quads(image, [i["poly"] for i in inst],
                      [i.get("text", "") for i in inst])


def draw_structurization(image: np.ndarray, regions: List[Dict]) -> np.ndarray:
    """DocumentStructurization output → layout regions (thick, per-category
    color + label) with their text lines (thin)."""
    import cv2

    out = np.ascontiguousarray(image.copy())
    for region in regions:
        cat = int(region.get("category_index", 0))
        color = _PALETTE[cat % len(_PALETTE)]
        pts = _poly_pts(region["region_poly"])
        cv2.polylines(out, [pts], True, color, 3)
        label = str(region.get("category_name", cat))
        x, y = int(pts[:, 0, 0].min()), int(pts[:, 0, 1].min())
        cv2.putText(out, label, (x, max(y - 6, 12)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2, cv2.LINE_AA)
        for line in region.get("text_list", []):
            cv2.polylines(out, [_poly_pts(line["poly"])], True, color, 1)
    return out


def draw_table(image: np.ndarray, table_result: Dict) -> np.ndarray:
    """TableParsing output ({"cells": [{"cell_poly", "texts"...}]}) →
    reference table_parsing_visualization: green cell polys + text quads."""
    import cv2

    out = np.ascontiguousarray(image.copy())
    for cell in table_result.get("cells", []):
        poly = cell.get("cell_poly") or cell.get("poly")
        if poly is None:
            continue
        p = np.asarray(poly, np.float32).reshape(-1)
        if p[0] < 0 or p[1] < 0:       # dummy cell (reference skip)
            continue
        cv2.polylines(out, [_poly_pts(p)], True, _CELL_COLOR, 2)
    return out


def save_image(image: np.ndarray, path: str) -> None:
    """RGB uint8 → file (cv2 expects BGR)."""
    import cv2

    cv2.imwrite(path, np.ascontiguousarray(image[..., ::-1]))

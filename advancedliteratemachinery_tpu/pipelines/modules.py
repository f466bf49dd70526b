"""Pipeline modules: callables over images, composable into pipelines.

Parity target: DocXChain's "modules" layer (reference Applications/
DocXChain/modules/): each module is a class whose `__call__(image)` (or
`__call__(image, detections)`) returns a plain result dict —
text_detection.py:37, text_recognition.py:35 (crop_image :100,
order_point :84), layout_analysis.py:49, table_structure_recognition.py.
Where DocXChain wraps ModelScope-hosted torch models, these wrap this
framework's jitted TPU models; the module API shape is preserved.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from advancedliteratemachinery_tpu.core.registry import PIPELINE_MODULES


def order_point(coor: Sequence[float]) -> np.ndarray:
    """Sort 4 points clockwise from top-left (text_recognition.py:84)."""
    arr = np.asarray(coor, np.float32).reshape(4, 2)
    centroid = arr.mean(axis=0)
    theta = np.arctan2(arr[:, 1] - centroid[1], arr[:, 0] - centroid[0])
    arr = arr[np.argsort(theta)]
    # rotate so the first point is the top-left-most
    start = int(np.argmin(arr[:, 0] + arr[:, 1]))
    return np.roll(arr, -start, axis=0)


def crop_image(image: np.ndarray, position: np.ndarray) -> np.ndarray:
    """Perspective-rectify a quad region (text_recognition.py:100)."""
    import cv2

    pts = np.asarray(position, np.float32).reshape(4, 2)

    def dist(a, b):
        return math.hypot(a[0] - b[0], a[1] - b[1])

    w = int(max(dist(pts[0], pts[1]), dist(pts[3], pts[2])))
    h = int(max(dist(pts[0], pts[3]), dist(pts[1], pts[2])))
    w, h = max(w, 1), max(h, 1)
    dst = np.asarray([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
    M = cv2.getPerspectiveTransform(pts, dst)
    return cv2.warpPerspective(image, M, (w, h))


@PIPELINE_MODULES.register("text_detection")
class TextDetection:
    """Wraps a detector: image → {'polygons': [N, 8], 'scores': [N]}.

    detect_fn: np.uint8 [H, W, 3] → (quads [N, 8], scores [N]) in image
    coords. Use models/db.py (DBDetector + extract_boxes) or any custom fn.
    """

    def __init__(self, detect_fn: Callable[[np.ndarray], tuple]):
        self.detect_fn = detect_fn

    def __call__(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        quads, scores = self.detect_fn(image)
        return {"polygons": np.asarray(quads, np.float32),
                "scores": np.asarray(scores, np.float32)}


@PIPELINE_MODULES.register("text_recognition")
class TextRecognition:
    """Crop each detected quad, batch-recognize on device
    (text_recognition.py:35).

    recognize_fn: uint8 crops [B, 32, 128, 3] → list of (text, conf, head).
    Defaults pair with engine.infer.MGPSTRInference.recognize.
    """

    def __init__(self, recognize_fn: Callable, crop_hw=(32, 128),
                 batch_size: int = 64):
        self.recognize_fn = recognize_fn
        self.crop_hw = crop_hw
        self.batch_size = batch_size

    def __call__(self, image: np.ndarray, detections: Dict) -> Dict:
        import cv2

        polys = detections["polygons"]
        crops = []
        for poly in polys:
            pts = order_point(poly)
            crop = crop_image(image, pts)
            crop = cv2.resize(crop, (self.crop_hw[1], self.crop_hw[0]))
            crops.append(crop)
        texts: List[str] = []
        confs: List[float] = []
        for i in range(0, len(crops), self.batch_size):
            chunk = crops[i:i + self.batch_size]
            batch = np.zeros((self.batch_size, *self.crop_hw, 3), np.uint8)
            batch[: len(chunk)] = np.stack(chunk) if chunk else 0
            results = self.recognize_fn(batch)
            for text, conf, _head in results[: len(chunk)]:
                texts.append(text)
                confs.append(conf)
        return {"texts": texts, "confidences": confs, "polygons": polys}


@PIPELINE_MODULES.register("layout_analysis")
class LayoutAnalysis:
    """Layout regions: image → {'layout_dets': [{'category_id', 'poly',
    'score'}]} (layout_analysis.py:49; DocXLayout main.py:85 output shape).

    predict_fn: image → (quads [N, 8], scores [N], category_ids [N]).
    """

    # DocXLayout's 13 coarse categories (DocXLayout/main.py mapping)
    CATEGORIES = ["title", "figure", "plain text", "header", "page number",
                  "footnote", "footer", "table", "table caption",
                  "figure caption", "equation", "full column", "sub column"]

    def __init__(self, predict_fn: Callable[[np.ndarray], tuple]):
        self.predict_fn = predict_fn

    def mapping(self, category_index: int) -> str:
        if 0 <= category_index < len(self.CATEGORIES):
            return self.CATEGORIES[category_index]
        return f"category_{category_index}"

    def __call__(self, image: np.ndarray) -> Dict:
        quads, scores, cats = self.predict_fn(image)
        dets = [{"category_id": int(c), "poly": np.asarray(q).tolist(),
                 "score": float(s)}
                for q, s, c in zip(quads, scores, cats)]
        return {"layout_dets": dets}


@PIPELINE_MODULES.register("table_structure_recognition")
class TableStructureRecognition:
    """Table cells + logical coordinates: image → {'polygons': [N, 8],
    'logi_coords': [N, 4]} (table_structure_recognition.py; LORE output)."""

    def __init__(self, predict_fn: Callable[[np.ndarray], Dict]):
        self.predict_fn = predict_fn

    def __call__(self, image: np.ndarray) -> Dict:
        out = self.predict_fn(image)
        return {"polygons": np.asarray(out["polygons"], np.float32),
                "logi_coords": np.asarray(out["logi_coords"], np.int32)}


class FormulaRecognition:
    """Math-formula → LaTeX on detected formula regions (reference
    modules/formula_recognition.py:11 — an ONNX encoder/decoder/resizer
    trio). Two construction paths, matching the reference's shape:
    `FormulaRecognition.from_onnx(model_dir)` loads any
    LaTeX-OCR-format ONNX pair through pipelines/latex_ocr.py (the
    DEFAULT backend; needs onnxruntime, clear error when absent), or
    inject any callable (e.g. a jitted image-to-sequence model).
    `__call__(image)` returns {'latex': str}; `on_regions(image,
    polygons)` maps each region crop."""

    def __init__(self, latex_fn: Callable[[np.ndarray], str]):
        self.latex_fn = latex_fn

    @classmethod
    def from_onnx(cls, model_dir: str, **kw) -> "FormulaRecognition":
        from advancedliteratemachinery_tpu.pipelines.latex_ocr import (
            LatexOcrOnnx)
        return cls(LatexOcrOnnx.from_dir(model_dir, **kw))

    def __call__(self, image: np.ndarray) -> Dict:
        return {"latex": self.latex_fn(np.asarray(image))}

    def on_regions(self, image: np.ndarray, polygons: np.ndarray) -> List[Dict]:
        out = []
        for poly in np.asarray(polygons, np.float32).reshape(-1, 4, 2):
            crop = crop_image(image, order_point(poly.reshape(-1)))
            out.append({"polygon": poly.reshape(-1),
                        "latex": self.latex_fn(crop)})
        return out

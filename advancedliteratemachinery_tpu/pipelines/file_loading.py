"""Document file loading: images and (multi-page) PDFs → uint8 RGB arrays.

Reference: Applications/DocXChain/modules/file_loading.py:22 load_pdf
(Wand/ImageMagick rasterization) and load_image. ImageMagick isn't part of
this image, so PDF rasterization is gated on whichever backend is present
(PyMuPDF `fitz` or `pdf2image`) with a clear error when neither is.
"""

from __future__ import annotations

from typing import List

import numpy as np


def load_image(path: str) -> np.ndarray:
    """Image file → uint8 RGB [H, W, 3]."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def _pdf_backend():
    try:
        import fitz  # PyMuPDF
        return "fitz", fitz
    except ImportError:
        pass
    try:
        import pdf2image
        return "pdf2image", pdf2image
    except ImportError:
        return None, None


def load_pdf(path: str, dpi: int = 150) -> List[np.ndarray]:
    """PDF → list of uint8 RGB page arrays (load_pdf, file_loading.py:22)."""
    name, mod = _pdf_backend()
    if name == "fitz":
        pages = []
        with mod.open(path) as doc:
            zoom = dpi / 72.0
            for page in doc:
                pix = page.get_pixmap(matrix=mod.Matrix(zoom, zoom))
                arr = np.frombuffer(pix.samples, np.uint8).reshape(
                    pix.height, pix.width, pix.n)
                pages.append(np.ascontiguousarray(arr[..., :3]))
        return pages
    if name == "pdf2image":
        return [np.asarray(p.convert("RGB"), np.uint8)
                for p in mod.convert_from_path(path, dpi=dpi)]
    raise ImportError(
        "PDF loading needs PyMuPDF (`fitz`) or pdf2image; neither is "
        "installed in this environment. Rasterize the PDF to images "
        "externally and use load_image instead.")


def load_document(path: str, dpi: int = 150) -> List[np.ndarray]:
    """Any supported document file → list of uint8 RGB page arrays."""
    if path.lower().endswith(".pdf"):
        return load_pdf(path, dpi=dpi)
    return [load_image(path)]

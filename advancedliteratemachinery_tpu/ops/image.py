"""Fused on-device image front end.

Replaces the reference's host-side per-image PIL/cv2 preprocessing
(MGP-STR dataset.py:421 AlignCollate: PIL resize to 32x128 + ToTensor +
(x-0.5)/0.5; LORE base_detector.py:41 pre_process affine resize/normalize).
On TPU the whole batch is resized/normalized on device: uint8 batches are
DMA'd to HBM and everything else is fused XLA work, which is the throughput
lever for the ≥2k crops/sec/chip target.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def normalize_crops(images_u8: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 [B, H, W, C] → (x/255 - 0.5) / 0.5 in `dtype` (range [-1, 1])."""
    x = images_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    return x.astype(dtype)


@partial(jax.jit, static_argnames=("out_hw", "dtype", "antialias"))
def resize_word_crops(
    images_u8: jnp.ndarray,
    out_hw: Tuple[int, int] = (32, 128),
    dtype=jnp.bfloat16,
    antialias: bool = True,
) -> jnp.ndarray:
    """uint8 [B, H, W, C] → resized + normalized [B, h, w, C].

    Bilinear resize (PIL-equivalent up to interpolation kernel differences)
    fused with normalization in one jitted graph.
    """
    B, H, W, C = images_u8.shape
    x = images_u8.astype(jnp.float32)
    x = jax.image.resize(x, (B, out_hw[0], out_hw[1], C), method="bilinear",
                         antialias=antialias)
    x = x * (2.0 / 255.0) - 1.0
    return x.astype(dtype)

"""Exact RoIAlign (torchvision semantics) as a jit-safe XLA op.

Parity target: `torchvision.ops.roi_align(feat, rois, output_size,
spatial_scale, sampling_ratio=-1, aligned=False)` as used by GeoLayoutLM's
vision path (reference bros/modeling_bros_convnext.py:126-133: output 1x1,
spatial_scale = W_f/1000) and by detectron2's Cascade R-CNN pooler (VGT).

torchvision's adaptive sampling (`sampling_ratio=-1`) draws
ceil(roi_size/out_size) samples per bin — a data-dependent grid that can't
be traced. This implementation samples a FIXED max_grid x max_grid lattice
per bin and masks samples beyond the adaptive count, dividing by the true
count: bit-exact with torchvision for rois whose per-bin adaptive grid is
<= max_grid (text blocks are small; max_grid=8 covers bins up to 8 feature
pixels), and a uniform max_grid-point average beyond that.

Bilinear boundary semantics mirror the CUDA kernel
(torchvision/csrc/ops/cuda/roi_align_kernel.cu bilinear_interpolate):
samples with y < -1 or y > H contribute zero; y in [-1, 0] clamps to 0;
y_low >= H-1 collapses to the last row.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear(flat: jnp.ndarray, W: int, H: int, y: jnp.ndarray,
              x: jnp.ndarray) -> jnp.ndarray:
    """flat [B, H*W, C]; y/x [B, S] sample coords (index space) →
    [B, S, C] with torchvision boundary handling."""
    inside = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(jnp.floor(y), H - 1)
    x_low = jnp.minimum(jnp.floor(x), W - 1)
    # y_low >= H-1 → y_high = y_low = H-1, y snapped onto the row
    y = jnp.where(y_low >= H - 1, y_low, y)
    x = jnp.where(x_low >= W - 1, x_low, x)
    y_high = jnp.minimum(y_low + 1, H - 1)
    x_high = jnp.minimum(x_low + 1, W - 1)
    ly = y - y_low
    lx = x - x_low
    yl, yh = y_low.astype(jnp.int32), y_high.astype(jnp.int32)
    xl, xh = x_low.astype(jnp.int32), x_high.astype(jnp.int32)

    def g(yy, xx):
        return jnp.take_along_axis(flat, (yy * W + xx)[..., None], axis=1)

    out = (g(yl, xl) * ((1 - ly) * (1 - lx))[..., None]
           + g(yl, xh) * ((1 - ly) * lx)[..., None]
           + g(yh, xl) * (ly * (1 - lx))[..., None]
           + g(yh, xh) * (ly * lx)[..., None])
    return out * inside[..., None]


@partial(jax.jit, static_argnames=("out_hw", "max_grid", "aligned",
                                   "sampling_ratio"))
def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray,
              out_hw: Tuple[int, int] = (1, 1),
              spatial_scale: float = 1.0,
              sampling_ratio: int = -1,
              max_grid: int = 8,
              aligned: bool = False) -> jnp.ndarray:
    """feat [B, H, W, C]; boxes [B, N, 4] (x1, y1, x2, y2, unscaled).
    Returns [B, N, out_h, out_w, C].

    sampling_ratio > 0 uses that fixed grid (must be <= max_grid);
    sampling_ratio=-1 uses torchvision's adaptive ceil(bin_size) count,
    realized by masking the fixed max_grid lattice."""
    B, H, W, C = feat.shape
    N = boxes.shape[1]
    oh, ow = out_hw
    off = 0.5 if aligned else 0.0
    b = boxes.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = b[..., 0] - off, b[..., 1] - off, b[..., 2] - off, b[..., 3] - off
    # roi sizes from RAW coordinate differences, scaled once. Computing
    # (x2*s - x1*s) instead lets XLA contract the multiply+subtract into an
    # FMA in *some* duplicated fusions but not others, so ceil(roi_size)
    # can land on different sides of an exact-integer knife edge within one
    # graph — the sampling lattice then disagrees with the grid count
    # (observed on the CPU backend; optimization_barrier did not stop the
    # contraction). A raw subtract of graph inputs followed by one multiply
    # rounds deterministically. torchvision differences from its
    # per-coordinate rounding are <= 1 ulp and only matter for rois sized
    # within 1 ulp of an exact integer.
    bx = boxes.astype(jnp.float32)
    roi_w = (bx[..., 2] - bx[..., 0]) * spatial_scale
    roi_h = (bx[..., 3] - bx[..., 1]) * spatial_scale
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / ow                                     # [B, N]
    bin_h = roi_h / oh
    if sampling_ratio > 0:
        if sampling_ratio > max_grid:
            raise ValueError(f"sampling_ratio {sampling_ratio} > max_grid {max_grid}")
        gw = jnp.full_like(bin_w, sampling_ratio)
        gh = jnp.full_like(bin_h, sampling_ratio)
    else:
        gw = jnp.clip(jnp.ceil(bin_w), 1, max_grid)
        gh = jnp.clip(jnp.ceil(bin_h), 1, max_grid)

    gi = jnp.arange(max_grid, dtype=jnp.float32)           # sample index
    # sample coords per (box, out-bin, grid-idx):
    # y = y1 + ph*bin_h + (iy+0.5)*bin_h/grid_h   (kernel line: roi_start_h
    #     + ph*bin_size_h + (iy+.5)*bin_size_h/roi_bin_grid_h)
    ph = jnp.arange(oh, dtype=jnp.float32)
    pw = jnp.arange(ow, dtype=jnp.float32)
    ys = (y1[..., None, None] + ph[None, None, :, None] * bin_h[..., None, None]
          + (gi[None, None, None, :] + 0.5) * bin_h[..., None, None]
          / gh[..., None, None])                           # [B, N, oh, G]
    xs = (x1[..., None, None] + pw[None, None, :, None] * bin_w[..., None, None]
          + (gi[None, None, None, :] + 0.5) * bin_w[..., None, None]
          / gw[..., None, None])                           # [B, N, ow, G]
    vy = gi[None, None, None, :] < gh[..., None, None]     # [B, N, 1→oh, G]
    vx = gi[None, None, None, :] < gw[..., None, None]

    # full sample lattice [B, N, oh, ow, G, G]
    yy = jnp.broadcast_to(ys[:, :, :, None, :, None], (B, N, oh, ow, max_grid, max_grid))
    xx = jnp.broadcast_to(xs[:, :, None, :, None, :], (B, N, oh, ow, max_grid, max_grid))
    valid = (vy[:, :, :, None, :, None] & vx[:, :, None, :, None, :])
    valid = jnp.broadcast_to(valid, yy.shape)

    flat = feat.reshape(B, H * W, C)
    S = N * oh * ow * max_grid * max_grid
    samples = _bilinear(flat, W, H, yy.reshape(B, S), xx.reshape(B, S))
    samples = samples * valid.reshape(B, S, 1)
    samples = samples.reshape(B, N, oh, ow, max_grid * max_grid, C)
    count = (gh * gw)[..., None, None, None]               # true adaptive count
    return samples.sum(axis=4) / count

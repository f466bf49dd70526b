"""Pallas TPU kernel for windowed deformable convolution (DCNv2).

Why a kernel: XLA's row-gather on TPU moves ~4% of HBM bandwidth
(measured: one 192²x64 bf16 DCN layer ≈ 5 ms as `take_along_axis`
corners, and a pure-XLA shifted-window select is no better because the
64-term stencil chain spills to HBM between terms). Here the whole
padded feature map sits in VMEM and the bilinear gather becomes
MXU work: for each kernel tap and each window row offset u, the column
interpolation is ONE one-hot matmul
    G_u[r, n, :] = Σ_w CX[r, n, w] · x[row(r)+u, w, :]
with CX the per-position one-hot column weights ((w==⌊rx⌋)·(1-fx) +
(w==⌊rx⌋+1)·fx), and the row interpolation folds in as a cheap VPU
accumulate with the matching one-hot row weights. Out-of-window samples
produce all-zero weights (exactly the semantics `ops.deform_conv`'s
gather fallback guards with `lax.cond`). Zero padding reproduces the
reference CUDA kernel's zero-outside-image bilinear boundary
(dcn_v2_im2col_cuda.cu `dmcn_im2col_bilinear`).

Layout: NHWC, offsets split into dy/dx [B,H,W,K], mask [B,H,W,K],
weights [K, Cin, Cout]. Grid (B, H/TH); the x block is the full padded
map per batch element — valid for LORE/DocXLayout neck shapes (≤192²,
C ≤ 512 ⇒ ≤ 10.5 MB bf16); `dcn_windowed_pallas_supported` gates it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offy_ref, offx_ref, mask_ref, x_ref, w_ref, o_ref, *,
            radius: int, th: int, kh: int, kw: int, padding: int,
            dilation: int):
    R = radius
    TH, W, K = offy_ref.shape[1], offy_ref.shape[2], offy_ref.shape[3]
    Wp = x_ref.shape[2]
    C = x_ref.shape[3]
    Cout = o_ref.shape[3]
    P = R + padding + 1                     # pad applied by the caller
    i = pl.program_id(1)
    row0 = i * th

    col = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (TH, W, Wp), 2)

    acc = jnp.zeros((TH, W, Cout), jnp.float32)
    for k in range(kh * kw):
        ky = dilation * (k // kw) - padding
        kx = dilation * (k % kw) - padding
        ry = offy_ref[0, :, :, k].astype(jnp.float32) + ky   # rel. row
        rx = offx_ref[0, :, :, k].astype(jnp.float32) + kx
        iy = jnp.floor(ry)
        ix = jnp.floor(rx)
        fy = ry - iy
        fx = rx - ix
        iy = iy.astype(jnp.int32)
        ixi = ix.astype(jnp.int32)
        # fully-in-window gate in both dims (⌊δ⌋ ∈ [-R, R]): boundary
        # floors would contribute one partial corner and break the
        # sparse-correction accounting in ops/deform_conv._dcn_dispatch.
        # Folded into the [TH, W] fractions (NOT the [TH, W, Wp] one-hot)
        # to keep scoped-VMEM temporaries small.
        valid = ((iy >= ky - R) & (iy <= ky + R)
                 & (ixi >= kx - R) & (ixi <= kx + R)).astype(jnp.float32)
        fx0 = ((1.0 - fx) * valid)[..., None]
        fx1 = (fx * valid)[..., None]
        ixp = ixi + col + P                          # padded corner column
        cx = (jnp.where(wcol == ixp[..., None], fx0, 0.0)
              + jnp.where(wcol == ixp[..., None] + 1, fx1, 0.0)
              ).astype(x_ref.dtype)                  # [TH, W, Wp]

        def u_body(t, g):
            u = ky - R + t                           # absolute row offset
            slab = x_ref[0, pl.ds(row0 + P + u, TH), :, :]   # [TH, Wp, C]
            gu = jax.lax.dot_general(
                cx, slab,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [TH, W, C]
            cy = (jnp.where(iy == u, 1.0 - fy, 0.0)
                  + jnp.where(iy == u - 1, fy, 0.0))
            return g + cy[..., None] * gu

        g = jax.lax.fori_loop(0, 2 * R + 2, u_body,
                              jnp.zeros((TH, W, C), jnp.float32))
        g = g * mask_ref[0, :, :, k].astype(jnp.float32)[..., None]
        acc = acc + jax.lax.dot_general(
            g.astype(x_ref.dtype), w_ref[k],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def dcn_windowed_pallas_supported(x_shape: Tuple[int, ...], kh: int, kw: int,
                                  stride: int, radius: int,
                                  padding: int, dilation: int = 1,
                                  itemsize: int = 2) -> bool:
    """Eligibility: stride 1, SAME-size output (the kernel hardcodes
    out_shape == in_shape, so 2*padding must equal dilation*(k-1) on both
    axes), and the padded map + scratch fits comfortably in VMEM
    (~16 MB/core). `itemsize` is the input dtype's byte width (f32
    inputs stay resident at 4 B/elt). H need not divide the band height:
    `dcn_windowed_pallas` zero-pads rows up to the next multiple of 8
    (zero rows read as zero samples — exactly the reference's
    outside-image semantics) and slices the extra output rows off.

    Stride 2 stays out of scope by measurement of need, not difficulty:
    every DCN in the zoo (DLA IDAUp/DLAUp necks for LORE + DocXLayout,
    pose_dla_dcn.py:345) is stride-1 3×3; the strided variants in the
    reference op package have no consumer, and the gather formulation
    already covers them exactly."""
    B, H, W, C = x_shape
    if stride != 1:
        return False
    if 2 * padding != dilation * (kh - 1) or 2 * padding != dilation * (kw - 1):
        return False                       # output size would differ from H,W
    H = -(-H // 8) * 8                     # row-padded size the kernel sees
    P = radius + padding + 1
    x_bytes = (H + 2 * P) * (W + 2 * P) * C * itemsize   # resident copy
    scratch = 8 * W * (W + 2 * P) * itemsize + 2 * 8 * W * C * 4
    # v5e VMEM comfortably holds ~64 MB kernels (the vmem_limit_bytes
    # this module requests is 100 MB, the same knob JAX's TPU flash
    # attention raises); leave headroom for Mosaic's own buffers
    return x_bytes + scratch < 48 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("padding", "dilation",
                                             "radius", "interpret"))
def dcn_windowed_pallas(x, offsets, mask, weights, padding: int = 1,
                        dilation: int = 1, radius: int = 3,
                        interpret: bool = False):
    """x [B,H,W,Cin]; offsets [B,H,W,K,2] (dy,dx); mask [B,H,W,K];
    weights [kh,kw,Cin,Cout] → [B,H,W,Cout] (stride-1 DCN).

    Exact for samples whose integer offset displacement lies within
    ±radius (and for any sample falling outside the image — zero, as in
    the reference); the caller must gather-fallback otherwise
    (`ops.deform_conv.deform_conv2d` does, under `lax.cond`)."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weights.shape
    K = kh * kw
    TH = 8
    P = radius + padding + 1
    Hk = -(-H // TH) * TH      # round rows up to the band height; padded
    if Hk != H:                # rows are zero = outside-image samples, and
        pad_h = ((0, 0), (0, Hk - H), (0, 0))        # their output rows are
        offsets = jnp.pad(offsets, pad_h + ((0, 0), (0, 0)))  # sliced off
        mask = jnp.pad(mask, pad_h + ((0, 0),))
        x = jnp.pad(x, pad_h + ((0, 0),))
    x_pad = jnp.pad(x, ((0, 0), (P, P), (P, P), (0, 0)))
    offy = offsets[..., 0]
    offx = offsets[..., 1]
    wk = weights.reshape(K, Cin, Cout)

    grid = (B, Hk // TH)
    kernel = functools.partial(_kernel, radius=radius, th=TH, kh=kh, kw=kw,
                               padding=padding, dilation=dilation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TH, W, K), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, K), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, K), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hk + 2 * P, W + 2 * P, Cin),
                         lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Cin, Cout), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hk, W, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(offy, offx, mask, x_pad, wk)[:, :H]

"""Modulated deformable convolution v2 (DCNv2) — TPU-native.

Replaces the reference's CUDA kernels
(LORE-TSR/src/lib/models/networks/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu and
dcn_v2_cuda.cu; torch wrapper DCNv2/dcn_v2.py:15 `_DCNv2`, :147 `DCN`):
for each output position p and kernel tap k,
    out(p) = Σ_k  W_k · m_k(p) · bilinear(x, p·stride - pad + k·dilation
                                              + Δp_k(p))
with zero-padding outside the image and modulation mask m_k.

TPU-first design: the irregular sampling is expressed as 4 batched gathers
(bilinear corners) — pure VPU/memory work XLA fuses well — and the
contraction is ONE [B·Ho·Wo, K·Cin] x [K·Cin, Cout] matmul that saturates
the MXU. This mirrors the CUDA im2col+gemm structure but with the gather
graph vectorized over all taps at once instead of a hand-written kernel.
Layout is NHWC; offsets are [B, Ho, Wo, K, 2] (dy, dx) and mask
[B, Ho, Wo, K] (the checkpoint importer permutes torch's channel layout).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY


def bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample x [B,H,W,C] at float coords ys/xs [B,...]; zero outside.

    Matches dcn_v2_im2col_cuda.cu `dmcn_im2col_bilinear` + its boundary
    checks (a sample contributes only where -1 < y < H and -1 < x < W, with
    per-corner validity)."""
    B, H, W, C = x.shape
    out_shape = ys.shape  # [B, ...]
    ys = ys.reshape(B, -1)
    xs = xs.reshape(B, -1)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    x_flat = x.reshape(B, H * W, C)

    def corner(yi, xi, w):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
        vals = jnp.take_along_axis(x_flat, idx[..., None], axis=1)  # [B, N, C]
        return vals * (w * valid.astype(w.dtype))[..., None].astype(vals.dtype)

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    out = (
        corner(y0i, x0i, wy0 * wx0)
        + corner(y0i, x0i + 1, wy0 * wx1)
        + corner(y0i + 1, x0i, wy1 * wx0)
        + corner(y0i + 1, x0i + 1, wy1 * wx1)
    )
    return out.reshape(*out_shape, C)


@partial(jax.jit, static_argnames=("stride", "padding", "dilation",
                                   "per_tap"))
def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    weights: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    per_tap: bool = True,
) -> jnp.ndarray:
    """x [B,H,W,Cin]; offsets [B,Ho,Wo,K,2] (dy,dx); mask [B,Ho,Wo,K];
    weights [kh,kw,Cin,Cout] → [B,Ho,Wo,Cout].

    Two equivalent contractions:
    - per_tap=True (default): out = Σ_k (gather_k(x)·m_k) @ W_k — one
      [N, Cin] x [Cin, Cout] matmul per kernel tap, accumulated. Peak
      intermediate is [B, Ho·Wo, Cin] (K× smaller than the im2col form);
      each gather feeds its matmul directly, which XLA schedules without
      materializing the full patch tensor. At LORE scale (192² neck maps,
      C=256, K=9) the im2col buffer alone is hundreds of MB.
    - per_tap=False: classic im2col — one [B·Ho·Wo, K·Cin] x
      [K·Cin, Cout] matmul (mirrors dcn_v2_im2col_cuda.cu + gemm).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weights.shape
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    oy = jnp.arange(Ho) * stride - padding
    ox = jnp.arange(Wo) * stride - padding
    kyy, kxx = jnp.meshgrid(jnp.arange(kh) * dilation, jnp.arange(kw) * dilation,
                            indexing="ij")
    base_y = oy[:, None, None] + kyy.reshape(-1)[None, None, :]   # [Ho,1,K]
    base_x = ox[None, :, None] + kxx.reshape(-1)[None, None, :]   # [1,Wo,K]
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, K)).astype(offsets.dtype)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, K)).astype(offsets.dtype)

    ys = base_y[None] + offsets[..., 0]
    xs = base_x[None] + offsets[..., 1]

    if per_tap:
        wk = weights.reshape(K, Cin, Cout)
        out = jnp.zeros((B, Ho, Wo, Cout),
                        jnp.promote_types(x.dtype, weights.dtype))
        for k in range(K):
            g = bilinear_gather(x, ys[..., k], xs[..., k])  # [B,Ho,Wo,Cin]
            g = g * mask[..., k, None].astype(g.dtype)
            out = out + jnp.einsum("bhwc,cd->bhwd", g,
                                   wk[k].astype(g.dtype))
    else:
        patches = bilinear_gather(x, ys, xs)             # [B,Ho,Wo,K,Cin]
        patches = patches * mask[..., None].astype(patches.dtype)
        patches = patches.reshape(B, Ho, Wo, K * Cin)
        w2d = weights.reshape(K * Cin, Cout)
        out = jnp.einsum("bhwk,kc->bhwc", patches, w2d.astype(patches.dtype))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class DeformConv2d(nn.Module):
    """DCN module: a plain conv predicts (offsets, modulation), then
    `deform_conv2d` samples and contracts (reference DCN, dcn_v2.py:147 —
    conv_offset_mask 3x3 → o1,o2,sigmoid(mask))."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        kh, kw = self.kernel_size
        K = kh * kw
        off_mask = nn.Conv(
            3 * K, self.kernel_size, strides=(self.stride, self.stride),
            padding=self.padding, kernel_dilation=(self.dilation, self.dilation),
            dtype=p.compute_dtype, param_dtype=p.param_dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv_offset_mask",
        )(x)
        dy, dx, m = jnp.split(off_mask, 3, axis=-1)
        offsets = jnp.stack([dy, dx], axis=-1)            # [B,Ho,Wo,K,2]
        mask = jax.nn.sigmoid(m)                          # [B,Ho,Wo,K]

        weights = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, x.shape[-1], self.features),
            p.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), p.param_dtype)
        return deform_conv2d(
            x.astype(p.compute_dtype), offsets.astype(p.compute_dtype),
            mask.astype(p.compute_dtype), weights.astype(p.compute_dtype),
            bias, self.stride, self.padding, self.dilation,
        )

"""Fused multi-head attention Pallas kernel for short OCR sequences.

The encoder sequences in this framework are short (MGP-STR: 257 tokens,
ABINet: 256, OmniParser windows: 49) — flash-attention's KV blocking buys
nothing, but XLA's unfused path materializes the [B, H, S, S] fp32 score
tensor in HBM (≈1.2GB per ViT-base layer at B=256) and round-trips it
through the softmax. This kernel keeps the whole [S, S] score tile in VMEM
per (batch, head) program: qkᵀ → softmax → @v in one pass, no HBM traffic
for scores.

Falls back to the einsum path on CPU (interpret mode is too slow for CI;
the einsum path is the numerics oracle in tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # blocks: [1, 1, S, hd] → [S, hd]
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                             # [S, S] f32 in VMEM
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        a, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def mha_short_seq(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  scale: Optional[float] = None) -> jnp.ndarray:
    """q/k/v: [B, S, H, hd] → [B, S, H, hd]. Whole-sequence per-head fused
    attention; use only when S² f32 fits VMEM (S ≲ 1024).

    Internally runs in BHSD layout (Pallas blocks need the last two dims
    to be the full [S, hd] tile); XLA fuses the transposes into the
    surrounding projections."""
    B, S, H, hd = q.shape
    if scale is None:
        scale = hd ** -0.5
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, 1, S, hd), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=float(scale)),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * S * S * hd),
            bytes_accessed=4 * B * S * H * hd * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None,
              scale: Optional[float] = None) -> jnp.ndarray:
    """Dispatch: Pallas fused kernel on TPU for unmasked short sequences,
    einsum elsewhere. q/k/v [B, S, H, hd]."""
    B, S, H, hd = q.shape
    if scale is None:
        scale = hd ** -0.5
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and mask is None and S <= 1024 and S >= 8 and hd % 64 == 0:
        return mha_short_seq(q, k, v, scale=float(scale))
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if mask is not None:
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)

"""Fused multi-head attention Pallas kernels for short OCR sequences.

The encoder sequences in this framework are short (MGP-STR: 257 tokens,
ABINet: 256, OmniParser windows: 49) — flash-attention's KV blocking buys
nothing, but XLA's unfused path materializes the [B, H, S, S] score tensor
in HBM (≈1.2GB per ViT-base layer at B=256) and round-trips it through the
softmax. Measured on v5e (B=256, S=257, H=12, hd=64), the full attention
sublayer (qkv proj → attention → out proj):

    XLA einsum path:                 8.86 ms
    per-(b,h) Pallas + transposes:   ~8.4 ms (transposes dominate)
    fused-qkv Pallas (this file):    3.96 ms (unsafe softmax) / 4.60 (safe)

The key insight from profiling: a pure-copy Pallas kernel in the BHSD
layout already cost 4.8 ms — the [B,S,H,hd]→[B,H,S,hd] transposes around
the kernel, not the compute, were the bottleneck. `fused_qkv_attention`
therefore consumes the qkv projection output *directly* in its natural
[B, S, 3*D] layout (timm q|k|v concatenation — the same weight layout the
torch checkpoints use) and emits [B, S, D]; no layout change ever touches
HBM. Heads are lane-sliced inside VMEM.

Numerical safety: `safe=True` (default) subtracts the per-row max before
exp, exactly like jax.nn.softmax. `safe=False` skips the max pass (saves
~0.6 ms/layer); exp overflows f32 only when a logit exceeds ~88, which
trained encoders never approach — the inference engine opts in via
`Policy.unsafe_softmax`.

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

# per-program VMEM budget (bytes) for choosing the batch-block size G;
# conservative vs the 16MB/core so double-buffered DMA still fits.
_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_qkv_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int,
                      scale: float, safe: bool):
    """blocks: qkv [G, S, 3D] (q|k|v concat), out [G, S, D]."""
    G = qkv_ref.shape[0]
    D = num_heads * head_dim
    for g in range(G):
        x = qkv_ref[g]
        for h in range(num_heads):
            lo = h * head_dim
            qh = x[:, lo:lo + head_dim] * scale
            kh = x[:, D + lo: D + lo + head_dim]
            vh = x[:, 2 * D + lo: 2 * D + lo + head_dim]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if safe:
                s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            o = jax.lax.dot_general(
                e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = o / jnp.sum(e, axis=-1, keepdims=True)
            o_ref[g, :, lo:lo + head_dim] = o.astype(o_ref.dtype)


def _choose_group(batch: int, seq: int, dim: int,
                  n_score_bufs: int = 2, n_io_blocks: int = 4) -> int:
    """Largest G in {2, 1} whose blocks fit the VMEM budget.

    n_score_bufs: live [S, S] f32 intermediates (forward: scores + exp =
    2; backward: scores/probs/dp/ds ≈ 5). n_io_blocks: double-buffered
    IO block volume in units of [G, S, D] bf16 (forward: qkv in + out =
    4D worth; backward adds the dout input and dqkv output = 7D)."""
    s_pad = _round_up(seq, 8)
    k_pad = _round_up(seq, 128)
    scores = s_pad * k_pad * 4 * n_score_bufs
    for g in (2, 1):
        if batch % g:
            continue
        blocks = g * seq * n_io_blocks * dim * 2 * 2   # bf16, double-buffer
        if blocks + scores <= _VMEM_BUDGET:
            return g
    return 0


def _einsum_attention_from_qkv(qkv: jnp.ndarray, num_heads: int,
                               scale: float) -> jnp.ndarray:
    """Reference einsum formulation on the same [B, S, 3D] input — the
    numerics oracle and the recompute path for the custom VJP."""
    B, S, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, num_heads, hd)
    k = k.reshape(B, S, num_heads, hd)
    v = v.reshape(B, S, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_qkv_attention(qkv: jnp.ndarray, num_heads: int,
                        scale: Optional[float] = None, safe: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused MHA straight off the qkv projection.

    qkv: [B, S, 3*D] in timm layout (q rows | k rows | v rows — the layout
    `nn.Dense(3*D)` with imported timm weights produces). Returns [B, S, D].
    Use `supports_fused_qkv` to check shape eligibility first.

    Differentiable: the backward pass is a Pallas recompute kernel
    (_fused_qkv_bwd_kernel) that rebuilds the probabilities in VMEM and
    applies the analytic softmax VJP — no [B, H, S, S] tensor touches HBM
    in either direction. Falls back to the einsum VJP on CPU or when the
    backward working set exceeds VMEM.
    """
    B, S, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    G = _choose_group(B, S, D)
    if G == 0:
        # Shapes exceed the VMEM budget (caller skipped supports_fused_qkv);
        # fall back to the einsum formulation rather than a cryptic
        # ZeroDivisionError from grid=(B // G,).
        return _einsum_attention_from_qkv(qkv, num_heads, float(scale))
    kernel = functools.partial(
        _fused_qkv_kernel, num_heads=num_heads, head_dim=head_dim,
        scale=float(scale), safe=safe)
    in_spec = pl.BlockSpec((G, S, 3 * D), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((G, S, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        grid=(B // G,),
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * num_heads * (2 * S * S * head_dim),
            bytes_accessed=4 * B * S * D * qkv.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
    )(qkv)


def _fused_qkv_fwd(qkv, num_heads, scale, safe, interpret):
    return fused_qkv_attention(qkv, num_heads, scale, safe, interpret), qkv


def _fused_qkv_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads: int,
                          head_dim: int, scale: float):
    """Flash-style recompute backward entirely in VMEM.

    blocks: qkv [G, S, 3D], do [G, S, D] → dqkv [G, S, 3D]. Recomputes the
    [S, S] probabilities per (g, h) and applies the analytic softmax VJP:
        dV = Pᵀ·dO;  dP = dO·Vᵀ;  dS = P ⊙ (dP − rowsum(dP ⊙ P));
        dQ = dS·K·scale;  dK = dSᵀ·Q·scale.
    The einsum VJP this replaces round-trips two [B, H, S, S] tensors
    through HBM per layer (probs saved forward-in-backward + dP); here
    nothing bigger than [S, hd] ever leaves VMEM.
    """
    G = qkv_ref.shape[0]
    D = num_heads * head_dim
    for g in range(G):
        x = qkv_ref[g]
        do = do_ref[g]
        for h in range(num_heads):
            lo = h * head_dim
            qs = x[:, lo:lo + head_dim] * scale          # pre-scaled Q
            kh = x[:, D + lo: D + lo + head_dim]
            vh = x[:, 2 * D + lo: 2 * D + lo + head_dim]
            s = jax.lax.dot_general(
                qs, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [S, S]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)   # [S, S] f32
            doh = do[:, lo:lo + head_dim]                # [S, hd]
            pc = p.astype(vh.dtype)
            dv = jax.lax.dot_general(
                pc, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [S, hd]
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [S, S]
            r = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - r)).astype(kh.dtype)         # [S, S]
            dq = jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dt = dqkv_ref.dtype
            dqkv_ref[g, :, lo:lo + head_dim] = dq.astype(dt)
            dqkv_ref[g, :, D + lo: D + lo + head_dim] = dk.astype(dt)
            dqkv_ref[g, :, 2 * D + lo: 2 * D + lo + head_dim] = dv.astype(dt)


def _fused_qkv_bwd(num_heads, scale, safe, interpret, qkv, g):
    B, S, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    Gb = _choose_group(B, S, D, n_score_bufs=5, n_io_blocks=7)
    use_pallas = interpret or (
        jax.default_backend() not in ("cpu",)
        and D % num_heads == 0 and head_dim % 64 == 0 and S >= 8
        and Gb > 0)
    if not use_pallas:
        _, vjp = jax.vjp(
            lambda t: _einsum_attention_from_qkv(t, num_heads, float(scale)),
            qkv)
        return (vjp(g)[0],)
    if Gb == 0:
        Gb = 1
    kernel = functools.partial(
        _fused_qkv_bwd_kernel, num_heads=num_heads, head_dim=head_dim,
        scale=float(scale))
    qkv_spec = pl.BlockSpec((Gb, S, 3 * D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((Gb, S, D), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(B // Gb,),
        in_specs=[qkv_spec, do_spec],
        out_specs=qkv_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * num_heads * S * S * head_dim,
            bytes_accessed=8 * B * S * D * qkv.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
    )(qkv, g)
    return (dqkv,)


fused_qkv_attention.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


def supports_fused_qkv(batch: int, seq: int, dim: int, num_heads: int) -> bool:
    """Eligibility for the fused qkv Pallas path on the current backend."""
    if jax.default_backend() in ("cpu",):
        return False
    head_dim = dim // num_heads
    if dim % num_heads or head_dim % 64:  # lane-slice alignment
        return False
    if seq < 8:
        return False
    return _choose_group(batch, seq, dim) > 0


# ---------------------------------------------------------------------------
# Legacy per-(batch, head) kernel — kept as the BHSD-layout fallback for
# callers that already hold separate q/k/v (e.g. cross attention).
# ---------------------------------------------------------------------------

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

    NOTE: the BSHD→BHSD transposes this incurs cost more than the kernel
    saves at ViT shapes — prefer `fused_qkv_attention` for self-attention.
    """
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
    """Generic dispatch for callers holding separate q/k/v [B, S, H, hd].

    Self-attention inside transformer blocks should use
    `fused_qkv_attention` (via layers.MultiHeadSelfAttention) instead —
    it avoids the BSHD→BHSD transposes entirely.
    """
    B, S, H, hd = q.shape
    if scale is None:
        scale = hd ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if mask is not None:
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)

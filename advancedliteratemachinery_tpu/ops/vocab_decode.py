"""Fused vocab-head matmul + greedy decode Pallas kernel.

MGP-STR's BPE/WordPiece heads project 27 tokens to 50k/30k-way vocabs and
the greedy eval (reference OCR/MGP-STR/test_final.py:150-152,176-200) only
consumes argmax ids and the per-position max probability. The XLA path
materializes the [B, T, V] logits tensor in HBM (≈0.7GB bf16 for the BPE
head at B=256) and re-reads it for the argmax/max/logsumexp reductions —
pure bandwidth waste.

This kernel streams the head weight in vocab tiles through one MXU matmul
per tile and keeps an *online* running (max, argmax, sum-exp) per row in
VMEM scratch — the logits never exist in HBM. Outputs per row: greedy id
and max softmax probability (computed as 1/sum exp(logit - max), the same
value `exp(lmax - logsumexp)` yields).

Grid layout: (m_blocks, v_tiles) with the vocab dimension minor, so the
token block is fetched once per m_block and only the weight tiles stream;
running stats live in scratch and are reset at v==0 / emitted at the last
vocab tile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(tok_ref, w_ref, b_ref, ids_ref, pmax_ref,
            m_run, a_run, s_run, *, true_vocab: int, tv: int, nv: int):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        m_run[...] = jnp.full_like(m_run[...], NEG)
        a_run[...] = jnp.zeros_like(a_run[...])
        s_run[...] = jnp.zeros_like(s_run[...])

    scores = jax.lax.dot_general(
        tok_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [TM, TV] f32
    scores = scores + b_ref[...].astype(jnp.float32)  # bias row [1, TV]
    # mask vocab-padding columns (global col id >= true_vocab)
    col = v * tv + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < true_vocab, scores, NEG)

    tile_max = jnp.max(scores, axis=1, keepdims=True)           # [TM, 1]
    tile_arg = jnp.argmax(scores, axis=1).astype(jnp.int32)[:, None] + v * tv

    m_old = m_run[...]
    better = tile_max > m_old
    m_new = jnp.where(better, tile_max, m_old)
    a_run[...] = jnp.where(better, tile_arg, a_run[...])
    tile_sum = jnp.sum(jnp.exp(scores - m_new), axis=1, keepdims=True)
    s_run[...] = s_run[...] * jnp.exp(m_old - m_new) + tile_sum
    m_run[...] = m_new

    @pl.when(v == nv - 1)
    def _emit():
        ids_ref[...] = a_run[...][:, 0]
        pmax_ref[...] = 1.0 / s_run[...][:, 0]


def matmul_greedy_decode(tokens: jnp.ndarray, w: jnp.ndarray,
                         b: Optional[jnp.ndarray], true_vocab: int,
                         tm: int = 2048, tv: int = 512,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tokens [M, D] @ w [D, V] (+ b [V]) → (argmax ids [M] i32,
    max softmax prob [M] f32) without materializing logits.

    Columns >= true_vocab are treated as -inf (vocab padding). V must be a
    multiple of 128; D a multiple of 8.
    """
    M, D = tokens.shape
    V = w.shape[1]
    if b is None:
        b = jnp.zeros((V,), jnp.float32)
    tv = min(tv, _round_up(V, 128))
    v_pad = _round_up(V, tv)
    if v_pad != V:
        # padded columns score NEG via the true_vocab mask; pre-pad params
        # at engine init to make this a no-op under jit
        w = jnp.pad(w, ((0, 0), (0, v_pad - V)))
        b = jnp.pad(b, (0, v_pad - V))
    nv = v_pad // tv
    if tm % 128:
        raise ValueError(f"tm {tm} must be a multiple of 128 (1D out blocks)")
    m_pad = _round_up(M, tm)
    if m_pad != M:
        tokens = jnp.pad(tokens, ((0, m_pad - M), (0, 0)))
    nm = m_pad // tm

    grid = (nm, nv)
    out_ids, out_pmax = pl.pallas_call(
        functools.partial(_kernel, true_vocab=true_vocab, tv=tv, nv=nv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, D), lambda m, v: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tv), lambda m, v: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda m, v: (0, v),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm,), lambda m, v: (m,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm,), lambda m, v: (m,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad,), jnp.int32),
            jax.ShapeDtypeStruct((m_pad,), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tm, 1), jnp.float32),   # running max
            pltpu.VMEM((tm, 1), jnp.int32),     # running argmax
            pltpu.VMEM((tm, 1), jnp.float32),   # running sum-exp
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * D * v_pad,
            bytes_accessed=(m_pad * D * tokens.dtype.itemsize
                            + nm * D * v_pad * w.dtype.itemsize),
            transcendentals=m_pad * v_pad,
        ),
    )(tokens, w, b[None, :])
    return out_ids[:M], out_pmax[:M]


def matmul_greedy_decode_xla(tokens: jnp.ndarray, w: jnp.ndarray,
                             b: Optional[jnp.ndarray], true_vocab: int
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference XLA path (materializes logits) — numerics oracle and CPU
    fallback."""
    logits = tokens @ w
    if b is not None:
        logits = logits + b
    logits = logits.astype(jnp.float32)
    if logits.shape[-1] > true_vocab:
        mask = jnp.arange(logits.shape[-1]) >= true_vocab
        logits = jnp.where(mask, -jnp.inf, logits)
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lmax = jnp.max(logits, axis=-1)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return ids, jnp.exp(lmax - lse)


def supports_fused_decode(dim: int, vocab: int) -> bool:
    if jax.default_backend() in ("cpu",):
        return False
    return vocab % 128 == 0 and dim % 8 == 0 and vocab >= 1024

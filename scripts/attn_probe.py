"""Attention alternatives probe at the MGP-STR shape (B=256, S=257, h=12, dh=64).

Measures, on TPU:
  1. current fused_qkv_attention (baseline)
  2. official pallas flash_attention at S padded to 384, inputs pre-laid-out
     [B, h, S, dh] (kernel-only attainable time)
  3. the full sublayer via flash: qkv [B,S,3D] -> transpose -> flash -> back
     (what the model would actually pay, incl. layout changes)
  4. XLA einsum with bf16 softmax (no fp32 upcast)

Usage: python scripts/attn_probe.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from advancedliteratemachinery_tpu.ops import attention as A

    B, S, h, dh = 256, 257, 12, 64
    D = h * dh
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * D)), jnp.bfloat16)

    cur = jax.jit(lambda q: A.fused_qkv_attention(q, h, None, False).sum())
    print(f"current fused kernel: {timeit(cur, qkv):.3f} ms", flush=True)

    Sp = 384
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention, BlockSizes)
        qp = jnp.asarray(rng.standard_normal((B, h, Sp, dh)), jnp.bfloat16)
        seg = jnp.zeros((B, Sp), jnp.int32).at[:, :S].set(1)

        from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds
        sids = SegmentIds(q=seg, kv=seg)

        bs = BlockSizes(block_q=Sp, block_k_major=Sp, block_k=Sp, block_b=1)

        @jax.jit
        def fl(q):
            return flash_attention(q, q, q, segment_ids=sids,
                                   sm_scale=dh ** -0.5,
                                   block_sizes=bs).sum()

        print(f"flash kernel-only (S=384 padded): {timeit(fl, qp):.3f} ms",
              flush=True)

        @jax.jit
        def fl_full(qkv):
            x = qkv.reshape(B, S, 3, h, dh)
            x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0), (0, 0), (0, 0)))
            x = x.transpose(2, 0, 3, 1, 4)           # [3, B, h, Sp, dh]
            o = flash_attention(x[0], x[1], x[2], segment_ids=sids,
                                sm_scale=dh ** -0.5, block_sizes=bs)
            o = o.transpose(0, 2, 1, 3)[:, :S].reshape(B, S, D)
            return o.sum()

        print(f"flash incl. layout round-trip: {timeit(fl_full, qkv):.3f} ms",
              flush=True)
    except Exception as e:
        print(f"flash_attention unavailable/failed: {type(e).__name__}: {e}",
              flush=True)

    @jax.jit
    def xla_bf16(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, h, dh)
        k = k.reshape(B, S, h, dh)
        v = v.reshape(B, S, h, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh ** -0.5)
        p = jnp.exp(s - jax.lax.stop_gradient(jnp.max(s, -1, keepdims=True)))
        p = (p / jnp.sum(p, -1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v).sum()

    print(f"xla einsum bf16 softmax: {timeit(xla_bf16, qkv):.3f} ms",
          flush=True)

    # head-batched variant of our kernel idea: one batched dot per block
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(qkv_ref, o_ref):
        x = qkv_ref[0]                               # [S, 3D]
        qh = x[:, :D].reshape(S, h, dh).transpose(1, 0, 2)       # [h,S,dh]
        kh = x[:, D:2 * D].reshape(S, h, dh).transpose(1, 0, 2)
        vh = x[:, 2 * D:].reshape(S, h, dh).transpose(1, 0, 2)
        s = jax.lax.dot_general(
            qh * (dh ** -0.5), kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [h, S, S]
        e = jnp.exp(s)
        o = jax.lax.dot_general(
            e.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [h, S, dh]
        o = o / jnp.sum(e, -1, keepdims=True)
        o_ref[0] = o.transpose(1, 0, 2).reshape(S, D).astype(o_ref.dtype)

    hb = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, S, 3 * D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    hbj = jax.jit(lambda q: hb(q).sum())
    try:
        print(f"head-batched kernel: {timeit(hbj, qkv):.3f} ms", flush=True)
    except Exception as e:
        print(f"head-batched kernel failed: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()

"""Tuning variants for the fused-qkv attention kernel (B=256,S=257,h=12,dh=64).

Variants:
  base    current production kernel (G=2, unsafe softmax)
  g4      G=4 batch block (13.4MB VMEM, above the conservative budget)
  grid2d  (b, h) 2D grid — one head per step, qkv block revisited across h
  recip   reciprocal-multiply instead of VPU divide, G=2
  pairs   2-head aligned slice (load [S,128] once, halve in-register), G=2

Usage: python scripts/attn_tune.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    return (time.perf_counter() - t0) / iters * 1000


B, S, h, dh = 256, 257, 12, 64
D = h * dh
SCALE = dh ** -0.5


def kern_g(qkv_ref, o_ref, *, recip=False):
    G = qkv_ref.shape[0]
    for g in range(G):
        x = qkv_ref[g]
        for i in range(h):
            lo = i * dh
            qh = x[:, lo:lo + dh] * SCALE
            kh = x[:, D + lo:D + lo + dh]
            vh = x[:, 2 * D + lo:2 * D + lo + dh]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            e = jnp.exp(s)
            o = jax.lax.dot_general(e.astype(vh.dtype), vh,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            den = jnp.sum(e, -1, keepdims=True)
            o = o * (1.0 / den) if recip else o / den
            o_ref[g, :, lo:lo + dh] = o.astype(o_ref.dtype)


def make_g(G, recip=False, vmem=None):
    kw = {}
    if vmem:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem)
    f = pl.pallas_call(
        functools.partial(kern_g, recip=recip),
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.bfloat16),
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, S, 3 * D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, S, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        **kw,
    )
    return jax.jit(lambda q: f(q).sum())


def kern_2d(qkv_ref, o_ref):
    i = pl.program_id(1)
    x = qkv_ref[0]
    lo = i * dh
    qh = x[:, lo:lo + dh] * SCALE
    kh = x[:, D + lo:D + lo + dh]
    vh = x[:, 2 * D + lo:2 * D + lo + dh]
    s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    e = jnp.exp(s)
    o = jax.lax.dot_general(e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o / jnp.sum(e, -1, keepdims=True)
    o_ref[0, :, lo:lo + dh] = o.astype(o_ref.dtype)


def make_2d():
    f = pl.pallas_call(
        kern_2d,
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.bfloat16),
        grid=(B, h),
        in_specs=[pl.BlockSpec((1, S, 3 * D), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda q: f(q).sum())


def kern_pairs(qkv_ref, o_ref):
    G = qkv_ref.shape[0]
    for g in range(G):
        x = qkv_ref[g]
        for p in range(h // 2):
            lo = p * 2 * dh
            q2 = x[:, lo:lo + 2 * dh] * SCALE
            k2 = x[:, D + lo:D + lo + 2 * dh]
            v2 = x[:, 2 * D + lo:2 * D + lo + 2 * dh]
            for half in range(2):
                a, b = half * dh, (half + 1) * dh
                s = jax.lax.dot_general(q2[:, a:b], k2[:, a:b],
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                e = jnp.exp(s)
                o = jax.lax.dot_general(e.astype(v2.dtype), v2[:, a:b],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                o = o / jnp.sum(e, -1, keepdims=True)
                o_ref[g, :, lo + a:lo + b] = o.astype(o_ref.dtype)


def make_pairs(G=2):
    f = pl.pallas_call(
        kern_pairs,
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.bfloat16),
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, S, 3 * D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, S, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda q: f(q).sum())


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * D)), jnp.bfloat16)

    from advancedliteratemachinery_tpu.ops import attention as A
    cur = jax.jit(lambda q: A.fused_qkv_attention(q, h, None, False).sum())
    print(f"base (prod, G=2): {timeit(cur, qkv):.3f} ms", flush=True)

    for name, mk in [
        ("g4", lambda: make_g(4, vmem=15 * 1024 * 1024)),
        ("grid2d", make_2d),
        ("recip G=2", lambda: make_g(2, recip=True)),
        ("pairs G=2", make_pairs),
    ]:
        try:
            f = mk()
            print(f"{name}: {timeit(f, qkv):.3f} ms", flush=True)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()

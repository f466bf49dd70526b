"""Experiment: patch-gather (one lax.gather of 2x2xC slices per tap) vs the
current 4-corner take_along_axis bilinear gather, plus B-scaling."""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters * 1000, compile_s


def patch_gather(x_pad, ys, xs, H, W):
    """x_pad [B,H+2,W+2,C]; ys/xs [B,N] float sample coords in the UNPADDED
    frame. Returns bilinear samples [B,N,C], zero outside (-1, H)x(-1, W)."""
    B = x_pad.shape[0]
    C = x_pad.shape[-1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = (ys - y0)[..., None]                      # [B,N,1]
    wx1 = (xs - x0)[..., None]
    wy = jnp.concatenate([1.0 - wy1, wy1], -1)       # [B,N,2]
    wx = jnp.concatenate([1.0 - wx1, wx1], -1)
    valid = ((ys > -1) & (ys < H) & (xs > -1) & (xs < W))

    sy = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)    # padded-frame starts
    sx = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
    starts = jnp.stack([sy, sx], axis=-1)            # [B,N,2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        x_pad, starts, dnums, slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP)         # [B,N,2,2,C]
    w = (wy[:, :, :, None] * wx[:, :, None, :]) * valid[..., None, None]
    return jnp.einsum("bnijc,bnij->bnc", patches, w.astype(patches.dtype))


@partial(jax.jit, static_argnames=("scan_taps",))
def dcn_patch(x, offsets, mask, weights, scan_taps=False):
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weights.shape
    K = kh * kw
    oy = jnp.arange(H)
    ox = jnp.arange(W)
    kyy, kxx = jnp.meshgrid(jnp.arange(kh) - 1, jnp.arange(kw) - 1,
                            indexing="ij")
    base_y = (oy[:, None, None] + kyy.reshape(-1)[None, None, :])
    base_x = (ox[None, :, None] + kxx.reshape(-1)[None, None, :])
    ys = (base_y[None] + offsets[..., 0]).reshape(B, -1, K)
    xs = (base_x[None] + offsets[..., 1]).reshape(B, -1, K)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wk = weights.reshape(K, Cin, Cout)
    mk = mask.reshape(B, -1, K)

    if scan_taps:
        def body(acc, inp):
            ysk, xsk, mkk, wkk = inp
            g = patch_gather(x_pad, ysk, xsk, H, W) * mkk[..., None]
            return acc + g @ wkk, None
        acc = jnp.zeros((B, H * W, Cout), x.dtype)
        inps = (ys.transpose(2, 0, 1), xs.transpose(2, 0, 1),
                mk.transpose(2, 0, 1), wk)
        acc, _ = jax.lax.scan(body, acc, inps)
    else:
        acc = jnp.zeros((B, H * W, Cout), x.dtype)
        for k in range(K):
            g = patch_gather(x_pad, ys[..., k], xs[..., k], H, W)
            acc = acc + (g * mk[..., k, None]) @ wk[k]
    return acc.reshape(B, H, W, Cout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)

    from advancedliteratemachinery_tpu.ops.deform_conv import deform_conv2d

    for (B, H, W, Ci, Co) in [(1, 192, 192, 64, 64), (8, 192, 192, 64, 64),
                              (1, 96, 96, 256, 128), (8, 96, 96, 256, 128)]:
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), dt)
        off = jnp.asarray(rng.standard_normal((B, H, W, 9, 2)) * 1.5, dt)
        m = jnp.asarray(rng.uniform(0.3, 1.0, (B, H, W, 9)), dt)
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05, dt)

        f_old = jax.jit(lambda x, o, mm, w: deform_conv2d(x, o, mm, w))
        ms, cs = timeit(f_old, x, off, m, w)
        print(f"[{args.dtype}] old  B{B} {H}x{W} {Ci}->{Co}: {ms:7.2f} ms "
              f"(compile {cs:.0f}s)", flush=True)
        for scan in (False, True):
            f_new = jax.jit(lambda x, o, mm, w, s=scan: dcn_patch(
                x, o, mm, w, scan_taps=s))
            ms2, cs2 = timeit(f_new, x, off, m, w)
            # check parity vs old on small slice
            a = np.asarray(f_old(x, off, m, w), np.float32)
            b = np.asarray(f_new(x, off, m, w), np.float32)
            err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
            print(f"[{args.dtype}] new{'-scan' if scan else '    '} "
                  f"B{B} {H}x{W} {Ci}->{Co}: {ms2:7.2f} ms "
                  f"(compile {cs2:.0f}s) relerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()

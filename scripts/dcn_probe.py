"""Per-component LORE timing probe with SMALL compile units.

The full 768² LORE infer graph takes >9 min to XLA-compile (per-tap DCN
loops x14 layers + phase-decomposed upsamples make a huge HLO), so this
probe times pieces in isolation: one DCN layer at each neck shape, the
DLA trunk, the heads block, decode, processor — each its own jit.

Usage: python scripts/dcn_probe.py [--batch 1] [--size 768]
"""

import argparse
import os
import sys
import time

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=768)
    args = ap.parse_args()
    B, S = args.batch, args.size
    rng = np.random.default_rng(0)

    from advancedliteratemachinery_tpu.ops.deform_conv import deform_conv2d

    # one DCN layer at each shape the LORE neck actually runs
    # (Ho, Wo, Cin, Cout) — neck DCNs after each upsample/projection
    F = S // 4
    shapes = [
        (F, F, 64, 64),        # final IDA nodes at 1/4 res
        (F, F, 128, 64),       # final IDA proj
        (F // 2, F // 2, 128, 128),
        (F // 2, F // 2, 256, 128),
        (F // 4, F // 4, 256, 256),
        (F // 4, F // 4, 512, 256),
    ]
    for (H, W, Ci, Co) in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((B, H, W, 9, 2)) * 1.5,
                          jnp.float32)
        m = jnp.asarray(rng.uniform(0.3, 1.0, (B, H, W, 9)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05,
                        jnp.float32)
        for per_tap in (True, False):
            f = jax.jit(lambda x, o, mm, w, pt=per_tap: deform_conv2d(
                x, o, mm, w, per_tap=pt))
            ms, cs = timeit(f, x, off, m, w)
            gf = B * H * W * Ci * Co * 9 * 2 / 1e9
            print(f"dcn B{B} {H}x{W} {Ci}->{Co} per_tap={per_tap}: "
                  f"{ms:7.2f} ms  {gf / ms:6.2f} TF/s-ish "
                  f"(compile {cs:.1f}s)", flush=True)

    # DLA trunk
    from advancedliteratemachinery_tpu.models.dla import DLA, DLAConfig
    trunk = DLA(DLAConfig())
    x = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    tv = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    f = jax.jit(lambda v, x: [y.sum() for y in trunk.apply(v, x)])
    ms, cs = timeit(f, tv, x)
    print(f"dla trunk B{B} {S}²: {ms:7.2f} ms (compile {cs:.1f}s)",
          flush=True)

    # full DLASeg (trunk + neck + heads)
    from advancedliteratemachinery_tpu.models.dla import DLASeg, DLASegConfig
    seg = DLASeg(DLASegConfig())
    sv = jax.jit(seg.init)(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    f = jax.jit(lambda v, x: {k: o.sum() for k, o in
                              seg.apply(v, x).items()})
    ms, cs = timeit(f, sv, x)
    print(f"dlaseg B{B} {S}²: {ms:7.2f} ms (compile {cs:.1f}s)", flush=True)

    # decode + processor on fake head maps
    from advancedliteratemachinery_tpu.models.lore import (
        LORE, LoreConfig, LoreProcessor)
    from advancedliteratemachinery_tpu.ops.heatmap import (
        ctdet_4ps_decode, sigmoid_clamped)

    cfg = LoreConfig()
    hm = jnp.asarray(rng.standard_normal((B, F, F, 1)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((B, F, F, 8)), jnp.float32)
    axm = jnp.asarray(rng.standard_normal((B, F, F, 256)), jnp.float32)
    cr = jnp.asarray(rng.standard_normal((B, F, F, 256)), jnp.float32)
    reg = jnp.asarray(rng.standard_normal((B, F, F, 2)), jnp.float32)

    def dec(hm, wh, axm, cr, reg):
        d = ctdet_4ps_decode(sigmoid_clamped(hm), wh, axm, cr, reg=reg,
                             k=cfg.top_k)
        return d["detections"].sum() + d["ax_feat"].sum() + d["cr_feat"].sum()

    ms, cs = timeit(jax.jit(dec), hm, wh, axm, cr, reg)
    print(f"ctdet decode B{B}: {ms:7.2f} ms (compile {cs:.1f}s)", flush=True)

    proc = LoreProcessor(cfg)
    feat = jnp.asarray(rng.standard_normal((B, cfg.top_k, 256)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, F, (B, cfg.top_k, 8)), jnp.float32)
    pv = proc.init(jax.random.PRNGKey(0), feat, boxes)
    f = jax.jit(lambda v, ft, bx: jax.tree.map(
        lambda a: a.sum(), proc.apply(v, ft, bx)))
    ms, cs = timeit(f, pv, feat, boxes)
    print(f"processor B{B} K{cfg.top_k}: {ms:7.2f} ms (compile {cs:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()

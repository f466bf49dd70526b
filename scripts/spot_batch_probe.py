"""Batched-pages OmniParser spotting probe: pages/s at B ∈ {1,2,4,8}.

The offline spotting ceiling has been the B=1 `infer_spotting` graph
(zoo_bench omniparser_spot_64inst). `_greedy` is batch-generic, so a
`jax.vmap` over single-page inference runs B pages through ONE decode
loop — sequential ticks are shared across pages (the while_loop exits
when every page has hit EOS), so the per-step matmuls grow from
[1, d] to [B, d] at near-constant step latency until the MXU saturates.

Usage: python scripts/spot_batch_probe.py [--budget 130] [--sizes 1,2,4,8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=130,
                    help="pt seq budget (130 = 64-instance page)")
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from advancedliteratemachinery_tpu.models.omniparser import (
        OmniParser, OmniParserConfig)

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    cfg = OmniParserConfig(pt_seq_length=args.budget)
    m = OmniParser(cfg)
    rng = np.random.default_rng(0)
    seqs = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
    v = jax.jit(lambda k, x: m.init(k, x, seqs))(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)))

    single = jax.jit(lambda v, x: m.apply(v, x, method=m.infer_spotting))
    batched = jax.jit(jax.vmap(
        lambda v, img: m.apply(v, img[None], method=m.infer_spotting),
        in_axes=(None, 0)))

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    for B in [int(s) for s in args.sizes.split(",")]:
        x = jnp.asarray(rng.standard_normal((B, 640, 640, 3)), jnp.float32)
        fn = (lambda: single(v, x)) if B == 1 else (lambda: batched(v, x))
        out = fn()
        sync(out)                                     # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"B={B:2d}: {B / dt:8.2f} pages/s  ({dt * 1000:7.1f} ms/iter,"
              f" {dt * 1000 / B:6.1f} ms/page)", flush=True)


if __name__ == "__main__":
    main()

"""Continuous-batching evidence without a host loop: time the jitted
ragged decode tick of SpottingDecodeServer at different slot counts.

The tick advances EVERY slot each call, so if tick time grows sublinearly
with n_slots, cross-request batching multiplies decode throughput by the
occupancy. The host-driven service pays one tunnel round-trip per tick in
this axon image, which the local-TPU deployment does not — this probe
isolates the device-side cost.

Usage: python scripts/tick_probe.py [--slots 1,2,4,8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from advancedliteratemachinery_tpu.engine.serving import (
        SpottingDecodeServer)
    from advancedliteratemachinery_tpu.models.omniparser import (
        OmniParser, OmniParserConfig)

    cfg = OmniParserConfig()
    model = OmniParser(cfg)
    seqs = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
    params = jax.jit(lambda k, x: model.init(k, x, seqs))(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)))["params"]

    enc = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=lambda m, im: m.encode(im)))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 640, 640, 3)), jnp.float32)
    memory, mem_pos, mem_valid = enc(params, x)

    v = cfg.vocab()
    prompt = jnp.asarray([[v.rec_sos_index]], jnp.int32)

    for n_slots in [int(s) for s in args.slots.split(",")]:
        srv = SpottingDecodeServer(model, params, "rec", n_slots=n_slots,
                                   max_steps=cfg.rec_length,
                                   eos_id=v.rec_eos_index)
        cache_len = 1 + cfg.rec_length + 1
        logits, caches, mem_kvs, mem_bias = srv._prefill(
            params, memory, mem_pos, mem_valid, prompt, cache_len)
        state = srv._init_state(caches, mem_kvs, mem_bias, logits)
        for slot in range(n_slots):
            state = srv._insert(state, jnp.asarray([slot], jnp.int32),
                                logits, caches, mem_kvs, mem_bias,
                                jnp.asarray([1], jnp.int32))
        state, tok, _ = srv._tick(params, state)
        np.asarray(tok)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, tok, _ = srv._tick(params, state)
            # cap pos growth: reset finished flags so ticks stay uniform
        np.asarray(tok)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"slots={n_slots}: {dt * 1e3:6.2f} ms/tick "
              f"({n_slots / dt:8.0f} slot-steps/s)", flush=True)


if __name__ == "__main__":
    main()

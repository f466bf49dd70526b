"""TPU perf probe: batch-size sweep x fused-decode on/off for MGP-STR-base,
plus optional jax.profiler trace capture.

Usage: python scripts/perf_probe.py [--trace DIR] [--batches 256,512]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_engine(engine, images_u8, iters=20):
    dev = jnp.asarray(images_u8)
    out = engine._run(engine.params, dev)
    np.asarray(out["char_ids"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine._run(engine.params, dev)
    np.asarray(out["char_ids"])
    return images_u8.shape[0] * iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--batches", default="256,512")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
    from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig

    model = MGPSTR(MGPSTRConfig(variant="base"))
    x0 = jnp.zeros((1, 32, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    codec = CharCodec()
    rng = np.random.default_rng(0)

    for bs in [int(b) for b in args.batches.split(",")]:
        images = rng.integers(0, 256, (bs, 32, 128, 3), dtype=np.uint8)
        for mode in ("never", "auto"):
            eng = MGPSTRInference(model, params, codec, fused_decode=mode)
            ips = time_engine(eng, images, args.iters)
            print(f"B={bs:4d} fused={mode:5s}: {ips:8.1f} img/s", flush=True)

    if args.trace:
        eng = MGPSTRInference(model, params, codec)
        images = rng.integers(0, 256, (256, 32, 128, 3), dtype=np.uint8)
        dev = jnp.asarray(images)
        out = eng._run(eng.params, dev)
        np.asarray(out["char_ids"])
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = eng._run(eng.params, dev)
            np.asarray(out["char_ids"])
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()

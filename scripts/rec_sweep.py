"""Recognition batch-size sweep + e2e stage split at HEAD.

The e2e spotting bench runs 512 crops/iter; rec-only runs B=256. This
probe measures MGP-STR-base inference throughput at B=256/384/512 via the
fused decode path, plus the det-forward share, to see whether the e2e
batch shape is leaving throughput on the table.

Usage: python scripts/rec_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig

    model = MGPSTR(MGPSTRConfig(variant="base"))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3), jnp.float32))["params"]
    engine = MGPSTRInference(model, params, CharCodec())
    rng = np.random.default_rng(0)

    for B in (256, 384, 512, 768):
        ims = jnp.asarray(rng.integers(0, 256, (B, 32, 128, 3), np.uint8))
        out = engine._run(engine.params, ims)
        np.asarray(out["char_ids"])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = engine._run(engine.params, ims)
        np.asarray(out["char_ids"])
        dt = time.perf_counter() - t0
        print(f"B={B}: {B * iters / dt:.1f} img/s  ({dt / iters * 1000:.2f} ms/iter)",
              flush=True)

    # fused decode vs plain run split at B=512 — jitted + normalized so it
    # measures the same work _run pays (ADVICE r3: raw-uint8 eager probe
    # was not comparable).
    from advancedliteratemachinery_tpu.ops.image import normalize_crops

    ims = jnp.asarray(rng.integers(0, 256, (512, 32, 128, 3), np.uint8))
    dec = jax.jit(lambda p, x: engine._decode_all(
        p, normalize_crops(x, dtype=engine.input_dtype)))
    out = dec(engine.params, ims)
    np.asarray(out["char_ids"])
    t0 = time.perf_counter()
    for _ in range(10):
        out = dec(engine.params, ims)
    np.asarray(out["char_ids"])
    print(f"decode_all B=512: {512 * 10 / (time.perf_counter() - t0):.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()

"""End-of-round benchmark: MGP-STR-base word-crop recognition throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver's north-star of 2000 word-crop images/sec/chip
(BASELINE.json; the reference publishes no throughput numbers).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig

    cfg = MGPSTRConfig(variant="base")
    model = MGPSTR(cfg)
    codec = CharCodec()

    rng = np.random.default_rng(0)
    batch_size = 256
    images = rng.integers(0, 256, (batch_size, 32, 128, 3), dtype=np.uint8)

    x0 = jnp.zeros((1, 32, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    engine = MGPSTRInference(model, params, codec)

    # warmup / compile; hoist the host->device transfer out of the timed loop
    images_dev = jnp.asarray(images)
    out = engine(images)
    jax.block_until_ready(out["char_ids"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine._run(engine.params, images_dev)
    jax.block_until_ready(out["char_ids"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch_size * iters / dt
    baseline = 2000.0
    print(json.dumps({
        "metric": "mgp_str_base_infer_throughput",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()

"""TPU occupancy probe for the SpottingService continuous-batching path.

Submits P pages concurrently through the encode→pt→poly/rec slot servers
and compares wall time against strictly sequential submission — the ratio
is the cross-request batching win. Random weights (decode lengths are
random-ish but identical across both modes since decoding is
deterministic given weights).

Usage: python scripts/serving_probe.py [--pages 8] [--slots 8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    import jax
    from advancedliteratemachinery_tpu.engine.serving import SpottingService
    from advancedliteratemachinery_tpu.models.omniparser import (
        OmniParser, OmniParserConfig)

    cfg = OmniParserConfig(
        swin_variant="tiny", d_model=128, nhead=4, dec_layers=4,
        dim_feedforward=512, num_bins=500, pt_seq_length=24, poly_length=16,
        rec_length=16, max_instances=8, drop_path_rate=0.0)
    model = OmniParser(cfg)
    import jax.numpy as jnp
    images = jax.random.normal(jax.random.PRNGKey(0),
                               (args.pages, args.size, args.size, 3))
    seqs = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
    params = model.init(jax.random.PRNGKey(1), images[:1], seqs)["params"]

    pages = [np.asarray(images[i]) for i in range(args.pages)]

    svc = SpottingService(model, params, n_slots=args.slots).start()
    try:
        # warm both paths (compiles encoder + prefill/tick graphs)
        svc([pages[0]])

        t0 = time.perf_counter()
        for p in pages:
            svc([p])                       # sequential: one page at a time
        t_seq = time.perf_counter() - t0

        t0 = time.perf_counter()
        futs = [svc.submit(p) for p in pages]   # concurrent
        results = [f.result(timeout=600) for f in futs]
        t_conc = time.perf_counter() - t0
    finally:
        svc.stop()

    n_inst = sum(len(r["points"]) for r in results)
    print(f"pages={args.pages} slots={args.slots} instances={n_inst}")
    print(f"sequential: {t_seq:.2f}s  concurrent: {t_conc:.2f}s  "
          f"speedup: {t_seq / max(t_conc, 1e-9):.2f}x")
    sys.stdout.flush()


if __name__ == "__main__":
    main()

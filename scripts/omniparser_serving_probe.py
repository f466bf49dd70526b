"""OmniParser serving throughput under load (VERDICT r4 item 2).

Measures the full-size OmniParser SpottingService (the reference's
per-request sequential decode, OCR/OmniParser/model/transformer.py:235,
re-expressed as cross-request continuously-batched slot servers) at
increasing page concurrency:

  - pages/s at concurrency C ∈ {1, 8, 16, 32}
  - per-stage decode-slot occupancy (occupied_slot_ticks / ticks·slots)
  - encoder batching on/off (--encode-batch 1 disables)

The static-graph zoo_bench number (6.0 pages/s B=1, pt budget 130) is
the baseline this attacks: the service shares encoder forwards across
co-arriving pages, shares decode ticks across every in-flight page, and
keeps one tick in flight while fetching the previous tick's tokens
(depth-2 pipeline hiding the tunnel RTT).

Usage: python scripts/omniparser_serving_probe.py [--size 640]
       [--slots 16] [--encode-batch 4] [--pt-budget 130]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--encode-batch", type=int, default=4)
    ap.add_argument("--pt-budget", type=int, default=130,
                    help="pt_seq_length: 130 = a 64-instance page")
    ap.add_argument("--concurrency", type=int, nargs="*",
                    default=[1, 8, 16, 32])
    ap.add_argument("--burst", type=int, default=8,
                    help="decode ticks per device dispatch (lax.scan "
                         "burst; 1 = classic per-tick host sync)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke / CI)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from advancedliteratemachinery_tpu.engine.serving import SpottingService
    from advancedliteratemachinery_tpu.models.omniparser import (
        OmniParser, OmniParserConfig)

    if args.tiny:
        cfg = OmniParserConfig(
            swin_variant="tiny", d_model=128, nhead=4, dec_layers=4,
            dim_feedforward=512, num_bins=500, pt_seq_length=24,
            poly_length=16, rec_length=16, max_instances=8,
            drop_path_rate=0.0)
        args.size = min(args.size, 256)
    else:
        cfg = OmniParserConfig(pt_seq_length=args.pt_budget)
    model = OmniParser(cfg)
    rng = np.random.default_rng(0)
    images = [np.asarray(rng.standard_normal((args.size, args.size, 3)),
                         np.float32) for _ in range(max(args.concurrency))]
    seqs = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
    params = model.init(jax.random.PRNGKey(1),
                        jnp.asarray(images[0])[None], seqs)["params"]

    svc = SpottingService(model, params, n_slots=args.slots,
                          encode_batch=args.encode_batch,
                          burst_ticks=args.burst).start()
    try:
        # compile encode/prefill/tick (full-size compiles over a remote
        # tunnel can exceed the default result timeout)
        svc([images[0]], timeout=2400)
        for srv in (svc.pt_server, svc.poly_server, svc.rec_server):
            srv.stats.update(ticks=0, requests=0, occupied_slot_ticks=0)

        print(f"config: size={args.size} slots={args.slots} "
              f"encode_batch={args.encode_batch} burst={args.burst} "
              f"pt_seq={cfg.pt_seq_length}", flush=True)
        for conc in args.concurrency:
            t0 = time.perf_counter()
            futs = [svc.submit(images[i % len(images)])
                    for i in range(conc)]
            res = [f.result(timeout=900) for f in futs]
            dt = time.perf_counter() - t0
            occ = svc.occupancy
            n_inst = sum(len(r["points"]) for r in res)
            print(f"concurrency {conc:3d}: {conc / dt:6.2f} pages/s "
                  f"({dt / conc * 1000:7.1f} ms/page amortized, "
                  f"{n_inst} instances) occupancy "
                  f"pt={occ['pt']:.2f} poly={occ['poly']:.2f} "
                  f"rec={occ['rec']:.2f}", flush=True)
    finally:
        svc.stop()


if __name__ == "__main__":
    main()

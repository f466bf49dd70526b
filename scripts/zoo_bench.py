"""TPU throughput probe across the model zoo (full-size configs,
random weights — architecture/compile perf, not accuracy).

Usage: python scripts/zoo_bench.py [--only lister,levocr,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def bench(fn, sync, n_items, iters=10, warmup=1):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    return n_items / dt, dt * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[:1]

    if only is None or "lister" in only:
        from advancedliteratemachinery_tpu.models.lister import (
            LISTER, LISTERConfig)
        m = LISTER(LISTERConfig(variant="base"))
        B = 64
        x = jnp.asarray(rng.standard_normal((B, 32, 128, 3)), jnp.float32)
        mask = jnp.ones((B, 32, 128), jnp.float32)
        v = jax.jit(m.init)(key, x[:1], mask[:1])
        f = jax.jit(lambda v, x, mk: m.apply(v, x, mk))
        ips, ms = bench(lambda: f(v, x, mask), sync, B)
        print(f"lister_base_rec: {ips:8.1f} img/s  ({ms:.1f} ms/B{B})",
              flush=True)

    if only is None or "levocr" in only:
        from advancedliteratemachinery_tpu.models.levocr import (
            LevOCR, LevOCRConfig)
        cfg = LevOCRConfig()
        m = LevOCR(cfg)
        B = 64
        x = jnp.asarray(rng.standard_normal((B, 32, 128, 3)), jnp.float32)
        from advancedliteratemachinery_tpu.models.levocr import LevtDictionary
        d = LevtDictionary(max_len=cfg.max_len)
        tok = jnp.asarray(d.encode([""] * 1))
        v = jax.jit(lambda k, x, t: m.init(k, x, t, t, train=False))(key, x[:1], tok)
        f = jax.jit(lambda v, x: m.apply(v, x, method=m.refine))
        ips, ms = bench(lambda: f(v, x), sync, B)
        print(f"levocr_refine:   {ips:8.1f} img/s  ({ms:.1f} ms/B{B})",
              flush=True)

    if only is None or "lore" in only:
        from advancedliteratemachinery_tpu.models.lore import LORE, LoreConfig
        m = LORE(LoreConfig())
        v = jax.jit(lambda k: m.init_full(k, image_shape=(768, 768)))(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((1, 768, 768, 3)), jnp.float32)
        f = jax.jit(lambda v, x: m.apply(v, x, method=m.infer))
        ips, ms = bench(lambda: f(v, x), sync, 1)
        print(f"lore_tsr_infer:  {ips:8.1f} pages/s ({ms:.1f} ms/page 768²)",
              flush=True)

    if only is None or "docxlayout" in only:
        from advancedliteratemachinery_tpu.models.docxlayout import (
            DocXLayout, DocXLayoutConfig)
        m = DocXLayout(DocXLayoutConfig())
        v = jax.jit(m.init)(key, jnp.zeros((1, 768, 768, 3)))
        x = jnp.asarray(rng.standard_normal((1, 768, 768, 3)), jnp.float32)
        f = jax.jit(lambda v, x: m.apply(v, x, method=m.infer))
        ips, ms = bench(lambda: f(v, x), sync, 1)
        print(f"docxlayout:      {ips:8.1f} pages/s ({ms:.1f} ms/page 768²)",
              flush=True)

    if only is None or "omniparser" in only:
        from advancedliteratemachinery_tpu.models.omniparser import (
            OmniParser, OmniParserConfig)
        cfg = OmniParserConfig()
        m = OmniParser(cfg)
        seqs = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
        v = jax.jit(lambda k, x: m.init(k, x, seqs))(key, jnp.zeros((1, 640, 640, 3)))
        x = jnp.asarray(rng.standard_normal((1, 640, 640, 3)), jnp.float32)
        f = jax.jit(lambda v, x: m.apply(v, x, method=m.infer_spotting))
        ips, ms = bench(lambda: f(v, x), sync, 1, iters=3)
        print(f"omniparser_spot: {ips:8.1f} pages/s ({ms:.1f} ms/page 640²,"
              f" full 3-stage decode)", flush=True)

        # typical page: random weights never emit EOS, so the while_loop
        # early exit can't fire above — re-jit with a 130-token pt budget
        # (= a 64-instance page's worth of sequential ticks) to measure
        # what a real page costs once EOS lands
        cfg2 = OmniParserConfig(pt_seq_length=130)
        m2 = OmniParser(cfg2)
        f2 = jax.jit(lambda v, x: m2.apply(v, x, method=m2.infer_spotting))
        ips, ms = bench(lambda: f2(v, x), sync, 1, iters=3)
        print(f"omniparser_spot_64inst: {ips:8.1f} pages/s ({ms:.1f} "
              f"ms/page, pt budget 130)", flush=True)

    if only is not None and "serving" in only:
        # OmniParser page serving under load (VERDICT r4 item 2): the
        # SpottingService — batched page encoder + cross-request decode
        # slots + depth-2 pipelined ticks — at 16 concurrent pages,
        # vs the static B=1 graph above. Opt-in (slow: ~130 sequential
        # pt ticks per page ride the tunnel RTT).
        from advancedliteratemachinery_tpu.engine.serving import (
            SpottingService)
        from advancedliteratemachinery_tpu.models.omniparser import (
            OmniParser, OmniParserConfig)
        cfg = OmniParserConfig(pt_seq_length=130)
        m = OmniParser(cfg)
        seqs = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
        v = jax.jit(lambda k, x: m.init(k, x, seqs))(
            key, jnp.zeros((1, 640, 640, 3)))
        pages = [np.asarray(rng.standard_normal((640, 640, 3)), np.float32)
                 for _ in range(16)]
        svc = SpottingService(m, v["params"], n_slots=16,
                              encode_batch=4).start()
        try:
            svc([pages[0]])                       # compile
            for srv in (svc.pt_server, svc.poly_server, svc.rec_server):
                srv.stats.update(ticks=0, requests=0,
                                 occupied_slot_ticks=0)
            t0 = time.perf_counter()
            futs = [svc.submit(p) for p in pages]
            res = [f.result(timeout=900) for f in futs]
            dt = time.perf_counter() - t0
            occ = svc.occupancy
            n_inst = sum(len(r["points"]) for r in res)
            print(f"omniparser_serving: {16 / dt:8.2f} pages/s "
                  f"(16 concurrent, {n_inst} instances; occupancy "
                  f"pt={occ['pt']:.2f} poly={occ['poly']:.2f} "
                  f"rec={occ['rec']:.2f})", flush=True)
        finally:
            svc.stop()


if __name__ == "__main__":
    main()

"""Probe: can the tunnel's H2D page stream overlap device compute?

The honest e2e loop (bench.py e2e_spotting_bench) pays 9.8 MB of page
upload per iteration through a 20-40 MB/s tunnel. Round 5's loop issues
jnp.asarray on the main thread between dispatches; if the client-side
transfer blocks Python, upload serializes with dispatch and the honest
number lands between transfer-bound and transfer+compute-bound.

This probe measures, on the real chip, the same det->extract->rec
pipeline under four input-feeding disciplines:
  A. main-thread jnp.asarray per iteration (round-5 bench shape)
  B. background prefetch thread, depth-2 double buffer (a standard
     input pipeline: transfers overlap compute, still fully inside the
     timed region = honest)
  C. same with 2 uploader threads (does the tunnel carry 2 streams?)
  D. pages pre-staged in HBM (compute ceiling, for reference)

Usage: python scripts/h2d_overlap_probe.py
"""

import os
import queue
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(tempfile.gettempdir(), "alm_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np


def build():
    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
    from advancedliteratemachinery_tpu.models.db import DBConfig, DBDetector
    from advancedliteratemachinery_tpu.models.mgp_str import (
        MGPSTR, MGPSTRConfig)
    from advancedliteratemachinery_tpu.ops.cc_extract import (
        extract_boxes_device)
    from advancedliteratemachinery_tpu.ops.image import crop_rects

    P, PH, PW, K = 8, 640, 640, 64
    crop_hw = (32, 128)

    model = MGPSTR(MGPSTRConfig(variant="base"))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3), jnp.float32))["params"]
    engine = MGPSTRInference(model, params, CharCodec())

    det = DBDetector(DBConfig())
    rng = np.random.default_rng(0)
    det_vars = det.init(jax.random.PRNGKey(1), jnp.zeros((1, PH, PW, 3)))
    det_vars = jax.tree_util.tree_map(np.asarray, det_vars)
    up2 = det_vars["params"]["prob_up2"]
    up2["kernel"] = (up2["kernel"] * 0 + 1e-4).astype(up2["kernel"].dtype)
    up2["bias"] = (up2["bias"] * 0 - 8.0).astype(up2["bias"].dtype)
    det_vars = jax.tree_util.tree_map(jnp.asarray, det_vars)

    template = np.zeros((PH, PW), np.float32)
    for r in range(8):
        for c in range(8):
            x0, y0 = 16 + c * 76, 24 + r * 74
            template[y0:y0 + 20, x0:x0 + 64] = 1.0
    tmpl = jnp.asarray(template)

    decode_all = engine._decode_all

    det_f = jax.jit(lambda v, p, tm: jnp.maximum(
        det.apply(v, p)["prob"][..., 0], tm[None]))

    @jax.jit
    def rec_f(rp, pg, q, val):
        out = dict(decode_all(rp, crop_rects(pg, q, out_hw=crop_hw)
                              .reshape(P * K, crop_hw[0], crop_hw[1], 3)))
        out["n_valid"] = jnp.sum(val)
        return out

    def spot_step(pages_dev):
        pr = det_f(det_vars, pages_dev, tmpl)
        q, _s, val = extract_boxes_device(pr, max_boxes=K)
        return rec_f(engine.params, pages_dev, q, val)

    pages_np = [rng.integers(0, 256, (P, PH, PW, 3), dtype=np.uint8)
                for _ in range(10)]
    return spot_step, pages_np


def drain(futs):
    total = 0
    for f in futs:
        np.asarray(f["char_ids"])
        total += int(np.asarray(f["n_valid"]))
    return total


def main():
    spot_step, pages_np = build()
    iters = len(pages_np)

    # warmup/compile
    out0 = spot_step(jnp.asarray(pages_np[0]))
    n0 = drain([out0])
    print(f"warm boxes: {n0}")

    def run_A():
        futs = []
        t0 = time.perf_counter()
        for i in range(iters):
            futs.append(spot_step(jnp.asarray(pages_np[i])))
        total = drain(futs)
        return total / (time.perf_counter() - t0)

    def run_prefetch(n_threads):
        q_in = queue.Queue()
        q_out = [None] * iters
        done = [threading.Event() for _ in range(iters)]

        def uploader():
            while True:
                i = q_in.get()
                if i is None:
                    return
                q_out[i] = jnp.asarray(pages_np[i])
                done[i].set()

        ts = [threading.Thread(target=uploader, daemon=True)
              for _ in range(n_threads)]
        futs = []
        t0 = time.perf_counter()
        for th in ts:
            th.start()
        for i in range(iters):
            q_in.put(i)
        for i in range(iters):
            done[i].wait()
            futs.append(spot_step(q_out[i]))
            q_out[i] = None
        total = drain(futs)
        dt = time.perf_counter() - t0
        for _ in ts:
            q_in.put(None)
        return total / dt

    def run_staged():
        staged = [jnp.asarray(p) for p in pages_np]
        np.asarray(staged[-1][0, 0, 0, 0])
        futs = []
        t0 = time.perf_counter()
        for i in range(iters):
            futs.append(spot_step(staged[i]))
        total = drain(futs)
        return total / (time.perf_counter() - t0)

    for name, fn in [("A main-thread asarray (bench r5)", run_A),
                     ("B prefetch 1 thread", lambda: run_prefetch(1)),
                     ("C prefetch 2 threads", lambda: run_prefetch(2)),
                     ("C3 prefetch 3 threads", lambda: run_prefetch(3)),
                     ("D staged in HBM (ceiling)", run_staged)]:
        vals = [fn() for _ in range(2)]
        print(f"{name:36s} {max(vals):8.1f} crops/s "
              f"(runs: {', '.join(f'{v:.0f}' for v in vals)})", flush=True)


if __name__ == "__main__":
    main()

"""Stage breakdown of the e2e spotting bench (VERDICT r4 item 1).

Measures, on the real chip:
  1. each pipeline stage in isolation (det fwd / device box extraction /
     crop-warp / recognition+decode), separately compiled;
  2. the monolithic single-jit pipeline vs the split-dispatch pipeline
     bench.py ships — documenting the XLA scheduling pathology: the
     combined det+extract graph runs ~2.5x slower than the two
     separately-compiled executables back to back (identical HLO op
     inventory; the combined schedule for conv net + big broadcast
     reduces is the difference). Split dispatches are device-to-device
     (async dispatch chains them), so nothing extra crosses the tunnel;
  3. tunnel H2D/D2H bandwidth — the environment ceiling on the honest
     number: at the measured 20-40 MB/s, the 9.8 MB/iteration page
     stream alone costs 250-500 ms *unoverlapped*; a local TPU host
     moves it in <1 ms over PCIe.

Usage: python scripts/e2e_profile.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(tempfile.gettempdir(), "alm_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np


def main():
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
    pages = jnp.asarray(rng.integers(0, 256, (P, PH, PW, 3), np.uint8))
    pages_np = [rng.integers(0, 256, (P, PH, PW, 3), dtype=np.uint8)
                for _ in range(5)]
    rec_params = engine.params
    decode_all = engine._decode_all

    def t(name, fn, *a, iters=10):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:42s} {ms:8.1f} ms", flush=True)
        return ms

    det_f = jax.jit(lambda v, p, tm: jnp.maximum(
        det.apply(v, p)["prob"][..., 0], tm[None]))
    prob = det_f(det_vars, pages, tmpl)
    quads, _s, valid = extract_boxes_device(prob, max_boxes=K)

    rec_f = jax.jit(lambda rp, pg, q: dict(decode_all(
        rp, crop_rects(pg, q, out_hw=crop_hw).reshape(
            P * K, crop_hw[0], crop_hw[1], 3))))

    @jax.jit
    def mono(v, rp, pg, tm):
        pr = jnp.maximum(det.apply(v, pg)["prob"][..., 0], tm[None])
        q, _s2, val = extract_boxes_device(pr, max_boxes=K)
        out = dict(decode_all(rp, crop_rects(pg, q, out_hw=crop_hw)
                              .reshape(P * K, crop_hw[0], crop_hw[1], 3)))
        out["n_valid"] = jnp.sum(val)
        return out

    def split(v, rp, pg, tm):
        pr = det_f(v, pg, tm)
        q, _s2, val = extract_boxes_device(pr, max_boxes=K)
        return rec_f(rp, pg, q)

    print("== stage isolation (separately-compiled executables) ==")
    t("DB det forward (8x640^2, + template max)", det_f, det_vars, pages,
      tmpl)
    t("device box extraction (cc_iters=4, K=64)",
      lambda p: extract_boxes_device(p, max_boxes=K), prob)
    t("crop-warp + recognition + greedy decode", rec_f, rec_params, pages,
      quads)
    print("== composition ==")
    t("monolithic single-jit pipeline", mono, det_vars, rec_params, pages,
      tmpl)
    t("split-dispatch pipeline (bench.py shape)", split, det_vars,
      rec_params, pages, tmpl)

    print("== tunnel bandwidth (environment ceiling) ==")
    d = jnp.asarray(pages_np[0])
    np.asarray(d[0, 0, 0, 0])
    t0 = time.perf_counter()
    for p in pages_np:
        d = jnp.asarray(p)
    np.asarray(d[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    print(f"H2D: {5 * 9.83 / dt:6.1f} MB/s "
          f"({dt / 5 * 1000:.0f} ms per 9.8 MB page batch)")
    t0 = time.perf_counter()
    np.asarray(d)
    dt = time.perf_counter() - t0
    print(f"D2H: {9.83 / dt:6.1f} MB/s")


if __name__ == "__main__":
    main()

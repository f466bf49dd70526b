"""DCN fleet re-measure (VERDICT r4 item 5): every DCN consumer in the
zoo, with and without the Pallas windowed kernel, on the real chip.

- LORE-TSR full infer (detector + decode + processor) batch sweep
- DocXLayout full infer
- 640-px pages: the deepest DLA level is then 20 rows — eligible only
  since the r5 H%8 widening (kernel row-pads to the band height)

The no-Pallas leg forces the gather formulation by stubbing the
eligibility gate before the jit traces (same dispatch, same semantics —
tests/test_deform_window.py proves exact equality).

Usage: python scripts/dcn_fleet_bench.py [--batches 1,2,4,8,16]
       [--skip-gather]  (the gather legs are slow)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=10):
    import jax
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters * 1000, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8,16")
    ap.add_argument("--sizes", default="768,640")
    ap.add_argument("--skip-gather", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from advancedliteratemachinery_tpu.ops import deform_conv_pallas as dcp
    from advancedliteratemachinery_tpu.models.lore import LORE, LoreConfig
    from advancedliteratemachinery_tpu.models.docxlayout import (
        DocXLayout, DocXLayoutConfig)

    rng = np.random.default_rng(0)
    real_gate = dcp.dcn_windowed_pallas_supported
    legs = [("pallas", real_gate)]
    if not args.skip_gather:
        legs.append(("gather", lambda *a, **k: False))

    print(f"backend={jax.default_backend()}", flush=True)

    for leg, gate in legs:
        dcp.dcn_windowed_pallas_supported = gate
        try:
            for size in (int(s) for s in args.sizes.split(",")):
                m = LORE(LoreConfig())
                v = jax.jit(lambda k: m.init_full(
                    k, image_shape=(size, size)))(jax.random.PRNGKey(0))
                fi = jax.jit(lambda v, x: m.apply(v, x, method=m.infer))
                for B in (int(b) for b in args.batches.split(",")):
                    x = jnp.asarray(
                        rng.standard_normal((B, size, size, 3)), jnp.float32)
                    ms, cs = timeit(fi, v, x, iters=args.iters)
                    print(f"lore {leg:6s} {size}² B{B:<2d}: {ms:8.2f} ms "
                          f"{ms/B:7.2f} ms/page → {1000*B/ms:6.1f} pages/s "
                          f"(compile {cs:.0f}s)", flush=True)
                del m, v, fi

            dx = DocXLayout(DocXLayoutConfig())
            vd = jax.jit(dx.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 768, 768, 3)))
            fd = jax.jit(lambda v, x: dx.apply(v, x, method=dx.infer))
            for B in (1, 8):
                x = jnp.asarray(
                    rng.standard_normal((B, 768, 768, 3)), jnp.float32)
                ms, cs = timeit(fd, vd, x, iters=args.iters)
                print(f"docxlayout {leg:6s} 768² B{B:<2d}: {ms:8.2f} ms "
                      f"{ms/B:7.2f} ms/page → {1000*B/ms:6.1f} pages/s "
                      f"(compile {cs:.0f}s)", flush=True)
            del dx, vd, fd
        finally:
            dcp.dcn_windowed_pallas_supported = real_gate


if __name__ == "__main__":
    main()

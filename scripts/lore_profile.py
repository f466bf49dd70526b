"""Stage-level LORE-TSR + DocXLayout inference profile on TPU.

Times jitted scalar-reduced stages: DLA backbone trunk, DCN-neck heads,
device decode (top-k + gather), Processor — to locate the milliseconds
in the two slowest zoo entries (14.7 / 42.4 pages/s in round 3).

Usage: python scripts/lore_profile.py [--size 768]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=768)
    args = ap.parse_args()
    S = args.size

    from advancedliteratemachinery_tpu.models.lore import LORE, LoreConfig
    from advancedliteratemachinery_tpu.ops.heatmap import (
        corner_decode, ctdet_4ps_decode)
    from advancedliteratemachinery_tpu.models.lore import sigmoid_clamped

    model = LORE(LoreConfig())
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, S, S, 3)), jnp.float32)
    variables = model.init_full(jax.random.PRNGKey(0), (S, S))

    full = jax.jit(lambda v, im: model.apply(
        v, im, method=model.infer)["logic"].sum())
    print(f"lore full infer {S}²: {timeit(full, variables, x):7.2f} ms")

    heads = jax.jit(lambda v, im: sum(
        h.sum() for h in model.apply(v, im).values()))
    t_heads = timeit(heads, variables, x)
    print(f"  backbone+heads:     {t_heads:7.2f} ms")

    def through_decode(v, im):
        out = model.apply(v, im)
        hm = sigmoid_clamped(out["hm"][..., 0:1])
        dec = ctdet_4ps_decode(hm, out["wh"], out["ax"], out["cr"],
                               reg=out.get("reg"), k=model.config.top_k)
        return dec["detections"].sum() + dec["ax_feat"].sum()

    t_dec = timeit(jax.jit(through_decode), variables, x)
    print(f"  + ctdet decode:     {t_dec:7.2f} ms (+{t_dec - t_heads:.2f})")

    # DLA trunk alone (no DCN neck / heads): apply the bare DLA module
    # against the backbone's "base" param subtree
    from advancedliteratemachinery_tpu.models.dla import DLA

    trunk = DLA(model.config.backbone.dla)
    tv = {k: v["backbone"]["base"] for k, v in variables.items()
          if "backbone" in v and "base" in v["backbone"]}
    try:
        t_trunk = timeit(jax.jit(lambda v, im: sum(
            f.sum() for f in trunk.apply(v, im))), tv, x)
        print(f"  DLA trunk only:     {t_trunk:7.2f} ms")
    except Exception as e:  # subtree names may drift; stage is optional
        print(f"  DLA trunk only:     n/a ({type(e).__name__}: {e})")

    # DocXLayout
    from advancedliteratemachinery_tpu.models.docxlayout import (
        DocXLayout, DocXLayoutConfig)

    dx = DocXLayout(DocXLayoutConfig())
    vx = dx.init(jax.random.PRNGKey(0), x[:, :S, :S])
    fullx = jax.jit(lambda v, im: jax.tree.map(
        lambda a: a.sum(), dx.apply(v, im)))
    print(f"docxlayout full {S}²: "
          f"{timeit(fullx, vx, x):7.2f} ms")


if __name__ == "__main__":
    main()

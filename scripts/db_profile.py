"""Stage-level DB detector profile on TPU: where do the milliseconds go?

Times jitted prefixes of the forward (stem → backbone → FPN-fuse → heads)
plus head-internal variants, P=8 pages of 640x640 bf16, matching the
e2e bench workload.

Usage: python scripts/db_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from advancedliteratemachinery_tpu.models.db import (
        ConvBNRelu, DBConfig, DBDetector, ResBlock)

    P, H, W = 8, 640, 640
    det = DBDetector(DBConfig())
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (P, H, W, 3), np.uint8).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), x[:1])

    # reduce every output to a scalar inside jit — through the axon tunnel
    # a returned feature map times the network, not the compute
    full = jax.jit(lambda v, im: det.apply(v, im)["prob"].sum())
    t_full = timeit(full, variables, x)
    print(f"full forward: {t_full:.2f} ms")

    # stage prefixes via capture_intermediates on named filters is awkward;
    # instead rebuild prefix graphs with the same params through
    # flax's apply + a method that stops early
    import flax.linen as nn

    class Prefix(nn.Module):
        stop: str = "backbone"
        cfg: DBConfig = DBConfig()

        @nn.compact
        def __call__(self, images):
            from advancedliteratemachinery_tpu.core.precision import (
                DEFAULT_POLICY as p)
            cfg = self.cfg
            w = cfg.width
            x = ConvBNRelu(w, (7, 7), (2, 2), name="stem")(
                images.astype(p.compute_dtype))
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
            if self.stop == "stem":
                return x
            feats = []
            for s, (planes, stride) in enumerate(
                    [(w, 1), (2 * w, 2), (4 * w, 2), (8 * w, 2)]):
                for b in range(2):
                    x = ResBlock(planes, stride if b == 0 else 1,
                                 name=f"layer{s}_{b}")(x)
                feats.append(x)
            if self.stop == "backbone":
                return x
            lat = [nn.Conv(cfg.fpn_dim, (1, 1), dtype=p.compute_dtype,
                           name=f"lat{i}")(f) for i, f in enumerate(feats)]
            for i in range(2, -1, -1):
                up = jax.image.resize(lat[i + 1], lat[i].shape, "nearest")
                lat[i] = lat[i] + up
            outs = []
            ref = lat[0].shape
            for i, l in enumerate(lat):
                o = nn.Conv(cfg.head_dim, (3, 3), padding="SAME",
                            dtype=p.compute_dtype, name=f"smooth{i}")(l)
                if o.shape != ref:
                    o = jax.image.resize(
                        o, (o.shape[0], ref[1], ref[2], cfg.head_dim),
                        "nearest")
                outs.append(o)
            return jnp.concatenate(outs, axis=-1)


    for stop in ("stem", "backbone", "fuse"):
        m = Prefix(stop=stop)
        v = m.init(jax.random.PRNGKey(0), x[:1])
        f = jax.jit(lambda v, im, m=m: m.apply(v, im).sum())
        print(f"through {stop}: {timeit(f, v, x):.2f} ms")


if __name__ == "__main__":
    main()

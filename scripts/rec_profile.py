"""Component-level MGP-STR-base inference profile at the bench shape.

Times: full _run (forward+decode), trunk-only forward, attention op alone
at the exact (B=256, N=257, h=12, dh=64) shape (Pallas vs XLA einsum),
and a pure-MLP roofline probe, to locate the remaining throughput gap.

Usage: python scripts/rec_profile.py
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
    from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig

    B = 256
    model = MGPSTR(MGPSTRConfig(variant="base"))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3), jnp.float32))["params"]
    engine = MGPSTRInference(model, params, CharCodec())
    rng = np.random.default_rng(0)
    ims = jnp.asarray(rng.integers(0, 256, (B, 32, 128, 3), np.uint8))

    t_full = timeit(lambda p, x: engine._run(p, x), engine.params, ims,
                    iters=10)
    print(f"full _run: {t_full:.2f} ms  ({B / t_full * 1000:.0f} img/s)",
          flush=True)

    # trunk+heads forward only (model.apply, no vocab decode)
    m = engine.model

    @jax.jit
    def fwd(p, x):
        from advancedliteratemachinery_tpu.ops.image import normalize_crops
        xin = normalize_crops(x, dtype=m.policy.compute_dtype)
        out = m.apply({"params": p}, xin, deterministic=True,
                      decode_tokens=True)
        return {k: v.sum() for k, v in out.items()}

    print(f"forward only: {timeit(fwd, engine.params, ims, iters=10):.2f} ms",
          flush=True)

    # attention op at the exact shape
    from advancedliteratemachinery_tpu.ops import attention as attn_mod
    N, h, dh = 257, 12, 64
    D = h * dh
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * D)), jnp.bfloat16)

    fa = jax.jit(lambda q: attn_mod.fused_qkv_attention(
        q, h, None, False).sum())
    print(f"pallas fused attn (1 layer): {timeit(fa, qkv):.3f} ms", flush=True)

    xa = jax.jit(lambda q: attn_mod._einsum_attention_from_qkv(
        q, h, dh ** -0.5).sum())
    print(f"xla einsum attn (1 layer): {timeit(xa, qkv):.3f} ms", flush=True)

    # MLP roofline: tokens = B*257, 768->3072->768 bf16
    T = B * N
    x = jnp.asarray(rng.standard_normal((T, 768)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((768, 3072)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3072, 768)), jnp.bfloat16)

    @jax.jit
    def mlp(x, w1, w2):
        return jax.nn.gelu(x @ w1) @ w2

    t = timeit(mlp, x, w1, w2)  # ms
    fl = 2 * T * (768 * 3072 * 2)
    print(f"mlp (1 layer): {t:.3f} ms  ({fl / (t * 1e6) / 1e3:.2f} TFLOP/s)",
          flush=True)


if __name__ == "__main__":
    main()

"""Slow end-to-end learning test: a tiny LISTER overfits 4 rendered words
to exact-match decode. This is the strongest single check that the scan
neighbor decoder + losses + masking learn (reference LISTER trains the
same loop at scale, OCR/LISTER/trainer.py). Last verified run reached
EXACT MATCH at step 300 (loss 15.5 → 0.015).

Run with: pytest tests/test_lister_overfit.py -m slow --no-header -q
(excluded from the default suite via the `slow` marker).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import advancedliteratemachinery_tpu.models.focalnet as F
from advancedliteratemachinery_tpu.codecs.seq_codec import EosSeqCodec
from advancedliteratemachinery_tpu.models.lister import (
    LISTER, LISTERConfig, lister_losses)
from advancedliteratemachinery_tpu.ops.image import normalize_crops

TEXTS = ["cat", "dog", "sun", "car"]


@pytest.mark.slow
def test_tiny_lister_overfits_to_exact_match():
    PIL = pytest.importorskip("PIL")
    from PIL import Image, ImageDraw

    imgs = []
    for t in TEXTS:
        im = Image.new("RGB", (96, 32), "white")
        ImageDraw.Draw(im).text((6, 8), t, fill="black")
        imgs.append(np.asarray(im))
    x = normalize_crops(jnp.asarray(np.stack(imgs)), dtype=jnp.float32)
    mask = jnp.ones((4, 32, 96))

    F.FOCALNET_VARIANTS.setdefault("test_small", F.FocalNetConfig(
        embed_dim=16, depths=(1, 1, 2, 1), drop_path_rate=0.0))
    cfg = LISTERConfig(variant="test_small", max_ch=8, iters=0,
                       drop_path_rate=0.0)
    model = LISTER(cfg)
    codec = EosSeqCodec(max_ch=cfg.max_ch)
    ids, lens = codec.encode(TEXTS)
    labels = jnp.asarray(ids)
    lens_j = jnp.asarray(lens, jnp.float32)

    params = model.init(jax.random.PRNGKey(0), x, mask, train=True)["params"]

    def loss_fn(p, rng):
        res = model.apply({"params": p}, x, mask, train=True,
                          rngs={"dropout": rng})
        return lister_losses(res, labels, lens_j, cfg)["loss"]

    tx = optax.adam(2e-3)
    opt = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    eval_fn = jax.jit(lambda p: model.apply({"params": p}, x, mask,
                                            train=False))

    decoded = None
    for i in range(800):
        loss, g = grad_fn(params, jax.random.PRNGKey(i))
        updates, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, updates)
        if (i + 1) % 100 == 0:
            decoded = codec.decode(
                np.asarray(jnp.argmax(eval_fn(params)[0]["logits"], -1)))
            if decoded == TEXTS:
                return
    pytest.fail(f"no exact match after 800 steps; last decode: {decoded}, "
                f"loss {float(loss):.4f}")

"""Host-side batch iterators feeding `engine.fit.fit`.

Each iterator composes the data layer (BalancedMixer source mixing +
collation, reference MGP-STR dataset.py:30/:421) with the model's codec so
`fit()` only ever sees fixed-shape numpy dicts. Images stay uint8 across
the host→device boundary (4x smaller transfers); the matching `*_u8`
recipe wrappers below normalize on device inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import numpy as np

from advancedliteratemachinery_tpu.data.str_dataset import (
    AlignCollate,
    BalancedMixer,
    ListerCollate,
)
from advancedliteratemachinery_tpu.ops.image import normalize_crops


def mgp_str_batches(
    mixer: BalancedMixer,
    char_codec,
    bpe_codec=None,
    wp_codec=None,
    collate: Optional[AlignCollate] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """MGP-STR batches: images_u8 + char/bpe/wp target ids
    (train_final_dist.py:141-153 encodes all three granularities per
    batch). Missing subword codecs degrade to all-pad targets, which the
    ignore-pad CE zeroes out — the char head still trains."""
    collate = collate or AlignCollate()
    T = char_codec.max_tokens
    while True:
        samples = mixer.get_batch()
        images, labels = collate(samples)
        _, char_ids = char_codec.encode(labels)
        B = len(labels)
        bpe_ids = (bpe_codec.encode(labels) if bpe_codec
                   else np.zeros((B, T), np.int32))
        wp_ids = (wp_codec.encode(labels) if wp_codec
                  else np.zeros((B, T), np.int32))
        yield {"images": images, "char_ids": char_ids,
               "bpe_ids": bpe_ids.astype(np.int32),
               "wp_ids": wp_ids.astype(np.int32)}


def lister_batches(
    mixer: BalancedMixer,
    codec,
    collate: Optional[ListerCollate] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """LISTER batches: images_u8 + validity mask + EOS-seq labels
    (train_dist.py batch loop; labels are chars + EOS(0), zero-padded)."""
    collate = collate or ListerCollate()
    while True:
        samples = mixer.get_batch()
        images, mask, labels = collate(samples)
        ids, lens = codec.encode(labels)
        yield {"images": images, "mask": mask,
               "labels": np.asarray(ids, np.int32),
               "label_lens": np.asarray(lens, np.float32)}


# ---------------- u8-input recipe wrappers ----------------


def mgp_str_recipe_u8(model) -> Tuple[Callable, Any]:
    """mgp_str_recipe with uint8 images normalized on device."""
    from advancedliteratemachinery_tpu.engine.train import (
        make_optimizer,
        mgp_str_loss,
    )

    def loss_fn(params, batch, rng):
        x = normalize_crops(batch["images"], dtype=model.policy.compute_dtype)
        out = model.apply({"params": params}, x, deterministic=False,
                          rngs={"dropout": rng})
        m = mgp_str_loss(out, batch)
        return m["loss"], m

    return loss_fn, make_optimizer(lr=1e-4, total_steps=2_000_000,
                                   grad_clip=5.0)


def lister_recipe_u8(model, cfg) -> Tuple[Callable, Any]:
    """lister_recipe with uint8 images normalized on device."""
    from advancedliteratemachinery_tpu.engine.train import make_optimizer
    from advancedliteratemachinery_tpu.models.lister import lister_losses

    def loss_fn(params, batch, rng):
        x = normalize_crops(batch["images"], dtype=model.policy.compute_dtype)
        mask = batch["mask"].astype(x.dtype)
        res = model.apply({"params": params}, x, mask, train=True,
                          rngs={"dropout": rng})
        m = lister_losses(res, batch["labels"], batch["label_lens"], cfg)
        return m["loss"], m

    return loss_fn, make_optimizer(lr=8e-4, total_steps=600_000,
                                   grad_clip=20.0, weight_decay=0.01,
                                   warmup_steps=10_000)

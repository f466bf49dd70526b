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
    augment: Optional[Callable] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """MGP-STR batches: images_u8 + char/bpe/wp target ids
    (train_final_dist.py:141-153 encodes all three granularities per
    batch). Missing subword codecs degrade to all-pad targets, which the
    ignore-pad CE zeroes out — the char head still trains. `augment` is a
    per-image callable (data.augment.RandAugment — the reference's
    --isrand_aug transform, dataset.py:261-345) applied before collation."""
    collate = collate or AlignCollate()
    T = char_codec.max_tokens
    while True:
        samples = mixer.get_batch()
        if augment is not None:
            samples = [(augment(img), lab) for img, lab in samples]
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
    augment: Optional[Callable] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """LISTER batches: images_u8 + validity mask + EOS-seq labels
    (train_dist.py batch loop; labels are chars + EOS(0), zero-padded).
    `augment`: per-image callable applied before collation."""
    collate = collate or ListerCollate()
    while True:
        samples = mixer.get_batch()
        if augment is not None:
            samples = [(augment(img), lab) for img, lab in samples]
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


def omniparser_batches(
    dataset,
    vocab,
    batch_size: int,
    image_hw: Tuple[int, int] = (640, 640),
    max_pts: int = 16,
    poly_pts: int = 16,
    rec_length: int = 25,
    seed: int = 0,
    window_prompts: bool = True,
    use_char_window: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """OmniParser spotting batches (reference main.py train loop over
    dataset/text_spotting.py): resized uint8 pages + teacher-forced
    pt/poly/rec sequences. Coordinate bins are resize-invariant (quantized
    against the ORIGINAL page size), so images can be resized freely.

    With `window_prompts` (the reference default) the pt input begins with
    a sampled spatial window prompt (+ char-range window) and only the
    points inside the windows are targets (collate_fn.py:46/:85) — this is
    what makes the eval-time full-window prompt in-distribution. Shapes
    per batch: images [B, H, W, 3] u8; pt [B, P + 1 + 2*max_pts] where P
    is the prompt length (0 when disabled); poly [B, 2 + 2*poly_pts];
    rec [B, 2 + 1 + rec_length]. One random instance per page feeds the
    poly/rec tasks; prompt and pad positions carry padding_index in the
    *_out targets so the CE ignores them.
    """
    import os

    from PIL import Image

    from advancedliteratemachinery_tpu.data.coco_spotting import (
        build_spotting_sequences,
        char_window_prompt,
        spatial_window_prompt,
    )

    rng = np.random.default_rng(seed)
    H, W = image_hw
    pad = vocab.padding_index
    nb = vocab.num_bins
    n_chars = len(vocab.chars)
    P = (4 + (2 if use_char_window else 0)) if window_prompts else 0
    pt_L = P + 1 + 2 * max_pts + 1
    poly_L = 2 + 2 * poly_pts            # (cx cy sos p0..p_{2k-1})[:-1]
    rec_L = 2 + 1 + rec_length

    def char_tok(i):
        # COCO 'rec' ids are parser.py char-class indices; vocab places
        # them at num_bins + id (96 = recog padding)
        return vocab.num_bins + int(i)

    while True:
        batch = {
            "images": np.zeros((batch_size, H, W, 3), np.uint8),
            "pt_in": np.full((batch_size, pt_L - 1), pad, np.int32),
            "pt_out": np.full((batch_size, pt_L - 1), pad, np.int32),
            "poly_in": np.full((batch_size, poly_L), pad, np.int32),
            "poly_out": np.full((batch_size, poly_L), pad, np.int32),
            "rec_in": np.full((batch_size, rec_L - 1), pad, np.int32),
            "rec_out": np.full((batch_size, rec_L - 1), pad, np.int32),
        }
        for b in range(batch_size):
            s = dataset[int(rng.integers(0, len(dataset)))]
            path = os.path.join(s["image_folder"], s["file_name"])
            try:
                img = Image.open(path).convert("RGB").resize((W, H))
                batch["images"][b] = np.asarray(img)
            except FileNotFoundError:
                pass                      # blank page still trains seqs
            seqs = build_spotting_sequences(s, vocab, max_pts=max_pts,
                                            poly_pts=poly_pts)
            pt_body = seqs["pt_seq"][:-1]          # pairs, no eos
            if window_prompts:
                pts2 = pt_body.reshape(-1, 2)
                wprompt, keep = spatial_window_prompt(rng, pts2, nb)
                prompt = wprompt
                if use_char_window:
                    first = np.asarray(
                        [r[0] if len(r) else n_chars + 1
                         for r in seqs["rec_seqs"]], np.int64)[:len(pts2)]
                    cprompt, ckeep = char_window_prompt(
                        rng, first[keep], n_chars, nb)
                    kept = pts2[keep][ckeep]
                    prompt = np.concatenate([wprompt, cprompt])
                else:
                    kept = pts2[keep]
                body = kept.reshape(-1)
                full = np.concatenate(
                    [prompt, [vocab.pt_sos_index], body])
                batch["pt_in"][b, : len(full)] = full
                out = np.concatenate([body, [vocab.pt_eos_index]])
                batch["pt_out"][b, P: P + len(out)] = out
            else:
                pt = np.concatenate([pt_body, [vocab.pt_eos_index]])
                full = np.concatenate([[vocab.pt_sos_index], pt])
                batch["pt_in"][b, : len(full) - 1] = full[:-1]
                batch["pt_out"][b, : len(pt)] = pt

            n = len(seqs["poly_seqs"])
            if n:
                j = int(rng.integers(0, n))
                cx = int(seqs["pt_seq"][2 * j])
                cy = int(seqs["pt_seq"][2 * j + 1])
                poly = seqs["poly_seqs"][j]
                pfull = np.concatenate([[cx, cy, vocab.poly_sos_index],
                                        poly])
                batch["poly_in"][b, : len(pfull) - 1] = pfull[:-1]
                batch["poly_out"][b, 2: 2 + len(poly)] = poly

                raw = seqs["rec_seqs"][j]
                chars = [char_tok(i) for i in raw if int(i) < 96]
                tgt = chars[: rec_length - 1] + [vocab.rec_eos_index]
                rfull = np.concatenate(
                    [[cx, cy, vocab.rec_sos_index], tgt])
                batch["rec_in"][b, : len(rfull) - 1] = rfull[:-1]
                batch["rec_out"][b, 2: 2 + len(tgt)] = tgt
        yield batch


def omniparser_vie_batches(
    dataset,
    vocab,
    batch_size: int,
    image_hw: Tuple[int, int] = (640, 640),
    max_pt_body: int = 96,
    poly_pts: int = 16,
    rec_length: int = 25,
    seed: int = 0,
    use_char_window: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """OmniParser VIE training batches (reference collate_fn.py:180-188
    train_vie branch over cord.py/sroie.py datasets): the pt sequence is
    the reading-order instance walk with class tokens
    (data.vie_spotting.build_vie_pt_sequence) behind the FIXED full-window
    prompt (the VIE branch does not sample windows); poly/rec teacher
    forcing picks one random word per page, polygon linearly sampled from
    its quad. Output keys match omniparser_batches so the same recipe and
    fit driver run unchanged."""
    import os

    from PIL import Image

    from advancedliteratemachinery_tpu.data.vie_spotting import (
        build_vie_pt_sequence,
        quad_polygon,
    )

    rng = np.random.default_rng(seed)
    H, W = image_hw
    pad = vocab.padding_index
    nb = vocab.num_bins
    n_chars = len(vocab.chars)
    prompt = np.asarray(
        [0, 0, nb - 1, nb - 1] + ([nb, nb + n_chars] if use_char_window
                                  else []), np.int64)
    P = len(prompt)
    pt_L = P + 1 + max_pt_body + 1
    poly_L = 2 + 2 * poly_pts
    rec_L = 2 + 1 + rec_length

    while True:
        batch = {
            "images": np.zeros((batch_size, H, W, 3), np.uint8),
            "pt_in": np.full((batch_size, pt_L - 1), pad, np.int32),
            "pt_out": np.full((batch_size, pt_L - 1), pad, np.int32),
            "poly_in": np.full((batch_size, poly_L), pad, np.int32),
            "poly_out": np.full((batch_size, poly_L), pad, np.int32),
            "rec_in": np.full((batch_size, rec_L - 1), pad, np.int32),
            "rec_out": np.full((batch_size, rec_L - 1), pad, np.int32),
        }
        for b in range(batch_size):
            page = dataset[int(rng.integers(0, len(dataset)))]
            path = os.path.join(page["image_folder"], page["file_name"])
            try:
                img = Image.open(path).convert("RGB").resize((W, H))
                batch["images"][b] = np.asarray(img)
            except FileNotFoundError:
                pass

            body = build_vie_pt_sequence(page, vocab,
                                         max_tokens=max_pt_body)
            full = np.concatenate([prompt, [vocab.pt_sos_index], body])
            batch["pt_in"][b, : len(full)] = full
            out = np.concatenate([body, [vocab.pt_eos_index]])
            batch["pt_out"][b, P: P + len(out)] = out

            if page["words"]:
                h, w = page["orig_size"]
                j = int(rng.integers(0, len(page["words"])))
                word = page["words"][j]
                cx = int(vocab.quantize(word["center"][0], w))
                cy = int(vocab.quantize(word["center"][1], h))
                poly = quad_polygon(np.asarray(word["quad"], np.float64),
                                    pts_per_side=poly_pts // 2)
                q = np.stack([vocab.quantize(poly[:, 0], w),
                              vocab.quantize(poly[:, 1], h)],
                             axis=1).reshape(-1)
                pfull = np.concatenate([[cx, cy, vocab.poly_sos_index], q])
                batch["poly_in"][b, : len(pfull) - 1] = pfull[:-1]
                batch["poly_out"][b, 2: 2 + len(q)] = q

                chars = [nb + int(i) for i in word["rec"]
                         if int(i) <= n_chars]
                tgt = chars[: rec_length - 1] + [vocab.rec_eos_index]
                rfull = np.concatenate([[cx, cy, vocab.rec_sos_index], tgt])
                batch["rec_in"][b, : len(rfull) - 1] = rfull[:-1]
                batch["rec_out"][b, 2: 2 + len(tgt)] = tgt
        yield batch


def omniparser_table_batches(
    dataset,
    vocab,
    batch_size: int,
    image_hw: Tuple[int, int] = (640, 640),
    max_pt_body: int = 384,
    poly_pts: int = 16,
    rec_length: int = 25,
    seed: int = 0,
    use_char_window: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """OmniParser TABLE-RECOGNITION batches (the reference repo ships no
    TR dataset code — OCR/OmniParser/README.md reports the numbers only;
    see data/pubtabnet.py for the scheme): the pt sequence is the strict
    (x, y, class) triplet walk over table cells in HTML reading order,
    class tokens packing (header, row_start, empty, colspan, rowspan),
    behind the same FIXED full-window prompt the VIE branch uses. Poly
    and rec stages teacher-force one random NON-EMPTY cell per page
    (polygon linearly sampled from the cell bbox quad). Output keys match
    omniparser_batches so the same recipe/fit driver run unchanged."""
    import os

    from PIL import Image

    from advancedliteratemachinery_tpu.data.pubtabnet import (
        build_table_pt_sequence,
    )
    from advancedliteratemachinery_tpu.data.vie_spotting import quad_polygon

    rng = np.random.default_rng(seed)
    H, W = image_hw
    pad = vocab.padding_index
    nb = vocab.num_bins
    n_chars = len(vocab.chars)
    prompt = np.asarray(
        [0, 0, nb - 1, nb - 1] + ([nb, nb + n_chars] if use_char_window
                                  else []), np.int64)
    P = len(prompt)
    pt_L = P + 1 + max_pt_body + 1
    poly_L = 2 + 2 * poly_pts
    rec_L = 2 + 1 + rec_length

    while True:
        batch = {
            "images": np.zeros((batch_size, H, W, 3), np.uint8),
            "pt_in": np.full((batch_size, pt_L - 1), pad, np.int32),
            "pt_out": np.full((batch_size, pt_L - 1), pad, np.int32),
            "poly_in": np.full((batch_size, poly_L), pad, np.int32),
            "poly_out": np.full((batch_size, poly_L), pad, np.int32),
            "rec_in": np.full((batch_size, rec_L - 1), pad, np.int32),
            "rec_out": np.full((batch_size, rec_L - 1), pad, np.int32),
        }
        for b in range(batch_size):
            page = dataset[int(rng.integers(0, len(dataset)))]
            path = os.path.join(page["image_folder"], page["file_name"])
            try:
                img = Image.open(path).convert("RGB").resize((W, H))
                batch["images"][b] = np.asarray(img)
            except FileNotFoundError:
                pass

            body = build_table_pt_sequence(page, vocab,
                                           max_tokens=max_pt_body)
            full = np.concatenate([prompt, [vocab.pt_sos_index], body])
            batch["pt_in"][b, : len(full)] = full
            out = np.concatenate([body, [vocab.pt_eos_index]])
            batch["pt_out"][b, P: P + len(out)] = out

            h, w = page["orig_size"]
            filled = [c for c in page["cells"] if not c["empty"]]
            if filled:
                cell = filled[int(rng.integers(0, len(filled)))]
                cx = int(vocab.quantize(cell["center"][0], w))
                cy = int(vocab.quantize(cell["center"][1], h))
                poly = quad_polygon(np.asarray(cell["quad"], np.float64),
                                    pts_per_side=poly_pts // 2)
                q = np.stack([vocab.quantize(poly[:, 0], w),
                              vocab.quantize(poly[:, 1], h)],
                             axis=1).reshape(-1)
                pfull = np.concatenate([[cx, cy, vocab.poly_sos_index], q])
                batch["poly_in"][b, : len(pfull) - 1] = pfull[:-1]
                batch["poly_out"][b, 2: 2 + len(q)] = q

                chars = [nb + int(i) for i in cell["rec"]
                         if int(i) <= n_chars]
                tgt = chars[: rec_length - 1] + [vocab.rec_eos_index]
                rfull = np.concatenate([[cx, cy, vocab.rec_sos_index], tgt])
                batch["rec_in"][b, : len(rfull) - 1] = rfull[:-1]
                batch["rec_out"][b, 2: 2 + len(tgt)] = tgt
        yield batch


def omniparser_recipe_u8(model, padding_index: int) -> Tuple[Callable, Any]:
    """omniparser_recipe with uint8 images normalized on device."""
    from advancedliteratemachinery_tpu.engine.train import make_optimizer
    from advancedliteratemachinery_tpu.models.omniparser import (
        omniparser_loss,
    )

    def loss_fn(params, batch, rng):
        x = normalize_crops(batch["images"], dtype=model.policy.compute_dtype)
        out = model.apply({"params": params}, x,
                          {"pt": batch["pt_in"], "poly": batch["poly_in"],
                           "rec": batch["rec_in"]},
                          rngs={"dropout": rng})
        m = omniparser_loss(out, {"pt": batch["pt_out"],
                                  "poly": batch["poly_out"],
                                  "rec": batch["rec_out"]}, padding_index,
                            weights=(1.0, 1.0, 2.0))
        return m["loss"], m

    return loss_fn, make_optimizer(lr=5e-4, total_steps=400_000,
                                   grad_clip=0.1, weight_decay=1e-4,
                                   warmup_steps=5_000)


def db_batches(
    dataset,
    batch_size: int,
    image_hw: Tuple[int, int] = (640, 640),
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """DB detector batches from COCO spotting annotations: resized uint8
    pages + the DB paper's shrunk-probability / border-threshold maps
    (models.db.db_targets, polygons scaled to the train size)."""
    import os

    from PIL import Image

    from advancedliteratemachinery_tpu.data.coco_spotting import (
        bezier_polygon,
    )
    from advancedliteratemachinery_tpu.models.db import db_targets

    rng = np.random.default_rng(seed)
    H, W = image_hw
    while True:
        batch = {
            "images": np.zeros((batch_size, H, W, 3), np.uint8),
            "gt_prob": np.zeros((batch_size, H, W, 1), np.float32),
            "gt_thresh": np.zeros((batch_size, H, W, 1), np.float32),
            "thresh_mask": np.zeros((batch_size, H, W, 1), np.float32),
        }
        for b in range(batch_size):
            s = dataset[int(rng.integers(0, len(dataset)))]
            path = os.path.join(s["image_folder"], s["file_name"])
            try:
                img = Image.open(path).convert("RGB").resize((W, H))
                batch["images"][b] = np.asarray(img)
            except FileNotFoundError:
                pass
            h0, w0 = s["orig_size"]
            sx, sy = W / w0, H / h0
            polys = [bezier_polygon(bp) * np.asarray([sx, sy], np.float32)
                     for bp in s["bezier_pts"]]
            t = db_targets(polys, image_hw)
            for k in ("gt_prob", "gt_thresh", "thresh_mask"):
                batch[k][b] = t[k]
        yield batch


def db_recipe_u8(model) -> Tuple[Callable, Any]:
    """db_recipe (mutable: BatchNorm stats) with uint8 images normalized
    on device."""
    from advancedliteratemachinery_tpu.engine.recipes import db_recipe

    base_loss, tx = db_recipe(model)

    def loss_fn(params, batch_stats, batch, rng):
        x = normalize_crops(batch["images"], dtype=model.policy.compute_dtype)
        b = dict(batch)
        b["images"] = x
        return base_loss(params, batch_stats, b, rng)

    return loss_fn, tx


class TableDataset:
    """COCO-style table annotations for LORE training (the reference's
    dataset jsons carry `segmentation` 8-point cell polys and `logic_axis`
    [r0, r1, c0, c1] per annotation — src/lib/datasets/sample/ctdet.py)."""

    def __init__(self, image_folder: str, anno_file: str):
        import json

        self.image_folder = image_folder
        with open(anno_file) as f:
            coco = json.load(f)
        self.images = {im["id"]: im for im in coco["images"]}
        self.anns: Dict[int, list] = {}
        for a in coco["annotations"]:
            self.anns.setdefault(a["image_id"], []).append(a)
        self.ids = sorted(self.images)

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx):
        info = self.images[self.ids[idx]]
        anns = self.anns.get(self.ids[idx], [])
        cells = np.asarray([np.asarray(a["segmentation"],
                                       np.float32).reshape(4, 2)
                            for a in anns], np.float32) \
            if anns else np.zeros((0, 4, 2), np.float32)
        logic = np.asarray([np.asarray(a["logic_axis"],
                                       np.float32).reshape(-1)[:4]
                            for a in anns], np.float32) \
            if anns else np.zeros((0, 4), np.float32)
        return {"file_name": info["file_name"],
                "image_folder": self.image_folder,
                "orig_size": (info["height"], info["width"]),
                "cells": cells, "logic": logic}


def lore_batches(
    dataset: TableDataset,
    batch_size: int,
    image_hw: Tuple[int, int] = (512, 512),
    max_cells: int = 128,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """LORE batches: resized uint8 pages + CenterNet targets
    (models.lore.lore_targets with cells scaled to the train size)."""
    import os

    from PIL import Image

    from advancedliteratemachinery_tpu.models.lore import lore_targets

    rng = np.random.default_rng(seed)
    H, W = image_hw
    while True:
        batch = None
        for b in range(batch_size):
            s = dataset[int(rng.integers(0, len(dataset)))]
            path = os.path.join(s["image_folder"], s["file_name"])
            h0, w0 = s["orig_size"]
            scale = np.asarray([W / w0, H / h0], np.float32)
            cells = s["cells"] * scale[None, None]
            t = lore_targets(cells, s["logic"], image_hw,
                             max_cells=max_cells)
            if batch is None:
                batch = {"images": np.zeros((batch_size, H, W, 3),
                                            np.uint8)}
                batch.update({k: np.zeros((batch_size,) + v.shape,
                                          v.dtype) for k, v in t.items()})
            try:
                img = Image.open(path).convert("RGB").resize((W, H))
                batch["images"][b] = np.asarray(img)
            except FileNotFoundError:
                pass
            for k, v in t.items():
                batch[k][b] = v
        yield batch


def lore_recipe_u8(model) -> Tuple[Callable, Any]:
    """lore_recipe (mutable) with uint8 images normalized on device."""
    from advancedliteratemachinery_tpu.engine.recipes import lore_recipe

    base_loss, tx = lore_recipe(model)

    def loss_fn(params, batch_stats, batch, rng):
        b = dict(batch)
        b["images"] = normalize_crops(batch["images"],
                                      dtype=model.policy.compute_dtype)
        return base_loss(params, batch_stats, b, rng)

    return loss_fn, tx


def levocr_batches(
    mixer: BalancedMixer,
    dictionary,
    vision_len: int = 8,
    vision_classes: int = 37,
    sub_prob: float = 0.2,
    collate: Optional[AlignCollate] = None,
    seed: int = 0,
    intact_prob: float = 0.0,
) -> Iterator[Dict[str, np.ndarray]]:
    """LevOCR imitation-learning batches (reference models.py:62
    inject_noise + levt/levenshtein_utils.py supervision):

    - noised_tokens: random-delete corruption of the target (the roll-in);
    - masked_tgt_tokens + mask_ins/word_ins targets from the Levenshtein
      alignment (native C path when built, Python oracle otherwise);
    - word_predictions: target with random substitutions (simulated
      refinement output) scored by the deletion head;
    - vision_targets: ABINet charset ids (0 = EOS/pad, chars 1-based).
    """
    from advancedliteratemachinery_tpu.models.levocr import (
        BOS, EOS, PAD, UNK)
    from advancedliteratemachinery_tpu.ops.levenshtein import (
        ins_del_targets,
        ins_del_targets_native,
        random_delete,
    )

    collate = collate or AlignCollate()
    rng = np.random.default_rng(seed)
    charset = dictionary.itos[4:]
    char_to_vis = {c: i + 1 for i, c in enumerate(charset)}
    n_toks = len(dictionary)
    while True:
        samples = mixer.get_batch()
        images, labels = collate(samples)
        tgt = dictionary.encode(labels)
        noised = random_delete(rng, tgt, PAD, BOS, EOS,
                               intact_prob=intact_prob)
        res = ins_del_targets_native(noised, tgt, PAD, UNK)
        if res is None:
            res = ins_del_targets(noised, tgt, PAD, UNK)
        masked, masked_tgt, ins_t, del_t = res
        preds = tgt.copy()
        inner = (preds != PAD) & (preds != BOS) & (preds != EOS)
        subs = (rng.uniform(size=preds.shape) < sub_prob) & inner
        preds[subs] = rng.integers(4, n_toks, subs.sum())
        vision = np.zeros((len(labels), vision_len), np.int32)
        for i, t in enumerate(labels):
            ids = [char_to_vis.get(c, 0) for c in t][: vision_len - 1]
            vision[i, : len(ids)] = ids          # trailing zeros = EOS/pad
        yield {
            "images": images,
            "noised_tokens": noised.astype(np.int32),
            "masked_tgt_tokens": masked_tgt.astype(np.int32),
            "word_predictions": preds.astype(np.int32),
            "mask_ins_targets": ins_t.astype(np.int32),
            "mask_ins_masks": (noised[:, 1:] != PAD),
            "word_ins_targets": tgt.astype(np.int32),
            "word_ins_masks": masked,
            "word_del_targets": del_t.astype(np.int32),
            "word_del_masks": (preds != PAD),
            "vision_targets": vision,
        }


def levocr_text_batches(
    corpus,
    dictionary,
    batch_size: int,
    mutation=None,
    sub_prob: float = 0.2,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """LevOCR language-branch batches (train_language_dist.py:108-113):
    corpus text → SpellingMutation roll-in → Levenshtein imitation
    targets, no images and no vision targets."""
    from advancedliteratemachinery_tpu.data.text_corpus import (
        SpellingMutation)
    from advancedliteratemachinery_tpu.models.levocr import BOS, EOS, PAD, UNK
    from advancedliteratemachinery_tpu.ops.levenshtein import (
        ins_del_targets,
        ins_del_targets_native,
    )

    rng = np.random.default_rng(seed)
    mutation = mutation or SpellingMutation(seed=seed)
    n_toks = len(dictionary)
    while True:
        idx = rng.integers(0, len(corpus), batch_size)
        labels = [corpus[int(i)] for i in idx]
        noise = [mutation(t) for t in labels]
        tgt = dictionary.encode(labels)
        noised = dictionary.encode(noise)
        res = ins_del_targets_native(noised, tgt, PAD, UNK)
        if res is None:
            res = ins_del_targets(noised, tgt, PAD, UNK)
        masked, masked_tgt, ins_t, del_t = res
        preds = tgt.copy()
        inner = (preds != PAD) & (preds != BOS) & (preds != EOS)
        subs = (rng.uniform(size=preds.shape) < sub_prob) & inner
        preds[subs] = rng.integers(4, n_toks, subs.sum())
        yield {
            "noised_tokens": noised.astype(np.int32),
            "masked_tgt_tokens": masked_tgt.astype(np.int32),
            "word_predictions": preds.astype(np.int32),
            "mask_ins_targets": ins_t.astype(np.int32),
            "mask_ins_masks": (noised[:, 1:] != PAD),
            "word_ins_targets": tgt.astype(np.int32),
            "word_ins_masks": masked,
            "word_del_targets": del_t.astype(np.int32),
            "word_del_masks": (preds != PAD),
        }


def levocr_text_recipe(model, cfg) -> Tuple[Callable, Any]:
    """Language-branch-only recipe: LevT dual-policy losses through
    LevOCR.text_forward; the vision tower is never executed (reference
    train_language_dist.py trains the same full model with only the LevT
    branch receiving gradients). Non-mutable — no BatchNorm runs."""
    from advancedliteratemachinery_tpu.engine.train import make_optimizer
    from advancedliteratemachinery_tpu.models.levocr import LevOCR, levt_losses

    def loss_fn(params, batch, rng):
        res = model.apply(
            {"params": params}, batch["noised_tokens"],
            batch["masked_tgt_tokens"], batch["word_predictions"],
            method=LevOCR.text_forward, rngs={"dropout": rng})
        m = levt_losses(res, batch, cfg)
        return m["loss"], m

    return loss_fn, make_optimizer(lr=1e-4, total_steps=300_000,
                                   grad_clip=5.0)


def levocr_recipe_u8(model, cfg) -> Tuple[Callable, Any]:
    """levocr_recipe (mutable) with uint8 images normalized on device."""
    from advancedliteratemachinery_tpu.engine.recipes import levocr_recipe

    base_loss, tx = levocr_recipe(model, cfg)

    def loss_fn(params, batch_stats, batch, rng):
        b = dict(batch)
        b["images"] = normalize_crops(batch["images"],
                                      dtype=model.policy.compute_dtype)
        return base_loss(params, batch_stats, b, rng)

    return loss_fn, tx


class VIEPreprocessedDataset:
    """GeoLayoutLM-preprocessed page jsons (the output schema of reference
    preprocess/funsd_el/preprocess.py: blocks.first_token_idx_list /
    blocks.boxes, words[].tokens/boundingBox, parse.class/parse.relations,
    meta.image_path)."""

    def __init__(self, json_files):
        import glob
        import json
        import os

        if isinstance(json_files, str):
            if os.path.isdir(json_files):
                json_files = sorted(glob.glob(
                    os.path.join(json_files, "*.json")))
            else:
                json_files = [json_files]
        self.pages = []
        for f in json_files:
            with open(f, encoding="utf-8") as fh:
                self.pages.append(json.load(fh))

    def __len__(self):
        return len(self.pages)

    def __getitem__(self, idx):
        return self.pages[idx]


def vie_batches(
    dataset: VIEPreprocessedDataset,
    batch_size: int,
    class_names=("HEADER", "QUESTION", "ANSWER"),
    max_seq: int = 512,
    max_blocks: int = 96,
    image_size: int = 896,
    cls_id: int = 101,
    seed: int = 0,
    ordered: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """GeoLayoutLM VIE batches (reference
    lightning_modules/data_modules/vie_dataset.py _getitem_geo): [CLS] +
    word tokens with 4-point boxes, per-token BIO labels (B- on an
    entity's first token, I- on the rest, -100 on specials/pad),
    block-level linking labels from parse.relations, block ranks.

    ordered=True: one deterministic pass over the dataset (evaluation —
    each page exactly once, last batch repeats the final page to fill),
    then the iterator STOPS; default is the endless shuffled train
    stream."""
    import os

    from PIL import Image

    rng = np.random.default_rng(seed)
    S, N = max_seq, max_blocks
    n_cls = len(class_names)
    ordered_pos = 0
    while True:
        if ordered and ordered_pos >= len(dataset):
            return
        batch = {
            "image": np.zeros((batch_size, image_size, image_size, 3),
                              np.float32),
            "input_ids": np.zeros((batch_size, S), np.int32),
            "bbox_4p_normalized": np.zeros((batch_size, S, 8), np.float32),
            "attention_mask": np.zeros((batch_size, S), np.int32),
            "bbox": np.zeros((batch_size, S, 4), np.int32),
            "first_token_idxes": np.zeros((batch_size, N), np.int32),
            "block_mask": np.zeros((batch_size, N), np.int32),
            "line_rank_id": np.zeros((batch_size, S), np.int32),
            "line_rank_inner_id": np.zeros((batch_size, S), np.int32),
            "bio_labels": np.full((batch_size, S), -100, np.int32),
            "el_labels_blk": np.zeros((batch_size, N, N), np.float32),
            "el_label_blk_mask": np.zeros((batch_size, N, N), np.float32),
        }
        for b in range(batch_size):
            if ordered:
                page = dataset[min(ordered_pos, len(dataset) - 1)]
                ordered_pos += 1
            else:
                page = dataset[int(rng.integers(0, len(dataset)))]
            meta = page.get("meta", {})
            # both schemas: ours (width/height) and the reference
            # preprocess.py output (imageSize.{width,height})
            size = meta.get("imageSize", {})
            W = float(meta.get("width", size.get("width", 1000)))
            H = float(meta.get("height", size.get("height", 1000)))
            img_path = meta.get("image_path")
            if img_path and os.path.exists(img_path):
                img = Image.open(img_path).convert("RGB").resize(
                    (image_size, image_size))
                batch["image"][b] = np.asarray(img, np.float32)

            first_tok = page["blocks"]["first_token_idx_list"][:N]
            batch["first_token_idxes"][b, : len(first_tok)] = first_tok
            batch["block_mask"][b, : len(first_tok)] = 1

            batch["input_ids"][b, 0] = cls_id
            batch["attention_mask"][b, 0] = 1
            pos = 1
            word_start_tok = []          # word idx → its first token pos
            word_token_span = []
            for w in page["words"]:
                word_start_tok.append(pos)
                toks = w["tokens"]
                span = []
                quad = np.asarray(w["boundingBox"], np.float32).reshape(4, 2)
                x1, y1 = quad[:, 0].min(), quad[:, 1].min()
                x2, y2 = quad[:, 0].max(), quad[:, 1].max()
                for t in toks:
                    if pos >= S:
                        break
                    batch["input_ids"][b, pos] = t
                    batch["attention_mask"][b, pos] = 1
                    batch["bbox_4p_normalized"][b, pos] = \
                        (quad / np.asarray([W, H])).reshape(-1)
                    batch["bbox"][b, pos] = [x1 / W * 1000, y1 / H * 1000,
                                             x2 / W * 1000, y2 / H * 1000]
                    batch["bio_labels"][b, pos] = 0          # default O
                    span.append(pos)
                    pos += 1
                word_token_span.append(span)

            # block ranks per token (1-based block order; inner 1=first)
            starts = sorted(set(first_tok))
            blk_of_pos = np.zeros(S, np.int32)
            for bi, st in enumerate(first_tok):
                end = first_tok[bi + 1] if bi + 1 < len(first_tok) else pos
                lo, hi = min(st, S), min(end, S)
                batch["line_rank_id"][b, lo:hi] = bi + 1
                if lo < S:
                    batch["line_rank_inner_id"][b, lo] = 1
                    batch["line_rank_inner_id"][b, lo + 1: hi] = 2
                blk_of_pos[lo:hi] = bi

            # BIO labels from entity word sequences
            for ci, cname in enumerate(class_names):
                for seq in page["parse"]["class"].get(cname, []):
                    for wi, widx in enumerate(seq):
                        if widx >= len(word_token_span):
                            continue
                        for ti, p_ in enumerate(word_token_span[widx]):
                            is_b = (wi == 0 and ti == 0)
                            batch["bio_labels"][b, p_] = \
                                (1 + 2 * ci) if is_b else (2 + 2 * ci)

            # block-level linking labels (relations carry each block's
            # FIRST word index — preprocess.py form_id_to_word_idx)
            nblk = len(first_tok)
            batch["el_label_blk_mask"][b, :nblk, :nblk] = 1.0
            for head_w, tail_w in page["parse"].get("relations", []):
                if (head_w < len(word_start_tok)
                        and tail_w < len(word_start_tok)):
                    hb = int(blk_of_pos[min(word_start_tok[head_w], S - 1)])
                    tb = int(blk_of_pos[min(word_start_tok[tail_w], S - 1)])
                    batch["el_labels_blk"][b, hb, tb] = 1.0
        yield batch


def vlpt_batches(dataset, batch_size: int, seed: int = 0
                 ) -> Iterator[Dict[str, np.ndarray]]:
    """VLPT-STD pretraining batches straight off the pyarrow SynthText
    shards (data/arrow_dataset.py already emits the models/vlpt.py batch
    dict: image + MLM-masked ids/labels/masks — reference dataset.py +
    write_synthtext_pyarrow.py)."""
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.integers(0, len(dataset), batch_size)
        yield dataset.batch(idx.tolist(), rng=rng)


class WebRPGCacheDataset:
    """Per-page .npz records of cached embeddings + render parameters (the
    shape of reference get_cache_file.py outputs: MarkupLM global/element
    text embeddings, xpath embeddings, chrlen, element mask, parameter
    ids)."""

    KEYS = ("param_ids", "global_text", "element_text", "chrlen", "xpath",
            "element_mask")

    def __init__(self, path: str):
        import glob
        import os

        if os.path.isdir(path):
            self.files = sorted(glob.glob(os.path.join(path, "*.npz")))
        else:
            self.files = [path]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        with np.load(self.files[idx]) as z:
            return {k: z[k] for k in self.KEYS}


def webrpg_batches(dataset: WebRPGCacheDataset, batch_size: int,
                   max_elements: int = 64, seed: int = 0
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """WebRPG AR-training batches (reference trainer_ar.py
    training_dataset): stacked cached-embedding records padded to a fixed
    element count."""
    rng = np.random.default_rng(seed)
    probe = dataset[0]
    T = probe["param_ids"].shape[-1]
    Dg = probe["global_text"].shape[-1]
    De = probe["element_text"].shape[-1]
    Dx = probe["xpath"].shape[-1]
    N = max_elements
    while True:
        batch = {
            "param_ids": np.zeros((batch_size, N, T), np.int32),
            "global_text": np.zeros((batch_size, 1, Dg), np.float32),
            "element_text": np.zeros((batch_size, N, De), np.float32),
            "chrlen": np.zeros((batch_size, N), np.int32),
            "xpath": np.zeros((batch_size, N, Dx), np.float32),
            "element_mask": np.zeros((batch_size, N), np.float32),
        }
        for b in range(batch_size):
            r = dataset[int(rng.integers(0, len(dataset)))]
            n = min(len(r["param_ids"]), N)
            batch["param_ids"][b, :n] = r["param_ids"][:n]
            batch["global_text"][b] = r["global_text"][:1]
            batch["element_text"][b, :n] = r["element_text"][:n]
            batch["chrlen"][b, :n] = r["chrlen"][:n]
            batch["xpath"][b, :n] = r["xpath"][:n]
            batch["element_mask"][b, :n] = \
                np.asarray(r["element_mask"][:n], np.float32)
        yield batch


class LVTRManifestDataset:
    """Manifest-driven LVTR renderer data (the reference's
    LVTR_trainlist.txt + data dir, dataset/lvtr_dataset.py): a jsonl of
    {"image", "removal", "render", "style"?, "line_mask", "word_mask",
    "text"} with paths relative to the manifest."""

    def __init__(self, manifest: str):
        import json
        import os

        self.root = os.path.dirname(os.path.abspath(manifest))
        self.rows = []
        with open(manifest, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.rows.append(json.loads(line))

    def __len__(self):
        return len(self.rows)

    def load(self, row, key, hw, channels=3):
        import os

        from PIL import Image

        path = os.path.join(self.root, row[key])
        img = Image.open(path)
        img = img.convert("RGB" if channels == 3 else "L")
        img = img.resize((hw[1], hw[0]))
        arr = np.asarray(img, np.float32) / 255.0
        return arr if channels == 3 else arr[..., None]


def lvtr_batches(
    dataset: LVTRManifestDataset,
    batch_size: int,
    image_hw: Tuple[int, int] = (64, 512),
    charset: str = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
                   "0123456789",
    max_text_len: int = 32,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """LVTR diffusion batches: target crop x0 + the five condition maps
    + char-id text (reference dataset_cfgs: 64x512 crops, chardict)."""
    rng = np.random.default_rng(seed)
    H, W = image_hw
    stoi = {c: i + 1 for i, c in enumerate(charset)}     # 0 = pad
    while True:
        batch = {
            "x0": np.zeros((batch_size, H, W, 3), np.float32),
            "images_style": np.zeros((batch_size, H, W, 3), np.float32),
            "images_removal": np.zeros((batch_size, H, W, 3), np.float32),
            "images_render": np.zeros((batch_size, H, W, 3), np.float32),
            "line_poly_mask": np.zeros((batch_size, H, W, 1), np.float32),
            "word_poly_mask": np.zeros((batch_size, H, W, 1), np.float32),
            "text_ids": np.zeros((batch_size, max_text_len), np.int32),
        }
        for b in range(batch_size):
            row = dataset.rows[int(rng.integers(0, len(dataset)))]
            batch["x0"][b] = dataset.load(row, "image", image_hw)
            batch["images_removal"][b] = dataset.load(row, "removal",
                                                      image_hw)
            batch["images_render"][b] = dataset.load(row, "render",
                                                     image_hw)
            batch["images_style"][b] = (
                dataset.load(row, "style", image_hw) if "style" in row
                else batch["x0"][b])
            batch["line_poly_mask"][b] = dataset.load(row, "line_mask",
                                                      image_hw, channels=1)
            batch["word_poly_mask"][b] = dataset.load(row, "word_mask",
                                                      image_hw, channels=1)
            ids = [stoi.get(c, 0) for c in row.get("text", "")]
            ids = ids[:max_text_len]
            batch["text_ids"][b, : len(ids)] = ids
        yield batch


class TRCGManifestDataset:
    """Pre-tokenized multimodal finetune records (reference TRCG data
    jsons after its tokenizer pass): jsonl of {"image": path,
    "input_ids": [ints]} relative to the manifest."""

    def __init__(self, manifest: str):
        import json
        import os

        self.root = os.path.dirname(os.path.abspath(manifest))
        self.rows = []
        with open(manifest, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.rows.append(json.loads(line))

    def __len__(self):
        return len(self.rows)


def trcg_batches(
    dataset: TRCGManifestDataset,
    batch_size: int,
    image_hw: Tuple[int, int],
    max_len: int = 256,
    pad_id: int = 0,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """TRCG LoRA-finetune batches: CLIP-space images + pre-tokenized
    conversation ids (reference llava/train/train.py data collator)."""
    import os

    from PIL import Image

    rng = np.random.default_rng(seed)
    H, W = image_hw
    while True:
        batch = {
            "images": np.zeros((batch_size, H, W, 3), np.float32),
            "input_ids": np.full((batch_size, max_len), pad_id, np.int32),
        }
        for b in range(batch_size):
            row = dataset.rows[int(rng.integers(0, len(dataset)))]
            path = os.path.join(dataset.root, row["image"])
            if os.path.exists(path):
                img = Image.open(path).convert("RGB").resize((W, H))
                batch["images"][b] = (np.asarray(img, np.float32)
                                      / 127.5 - 1.0)
            ids = row["input_ids"][:max_len]
            batch["input_ids"][b, : len(ids)] = ids
        yield batch


def vgt_batches(
    anno_file: str,
    image_root: str,
    tokenize_fn,
    image_hw: Tuple[int, int] = (512, 512),
    max_boxes: int = 64,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """VGT layout-detection batches (B=1 pages): COCO layout annotations
    (bbox xywh + category_id, 1-based) with optional per-image `words`
    lists (pdfplumber keys — reference create_grid_input.py) rasterized
    into the chargrid id map. Boxes scale to the train size."""
    import json
    import os

    from PIL import Image

    from advancedliteratemachinery_tpu.models.vgt import grid_ids_from_words

    with open(anno_file, encoding="utf-8") as f:
        coco = json.load(f)
    images = {im["id"]: im for im in coco["images"]}
    anns: Dict[int, list] = {}
    for a in coco["annotations"]:
        anns.setdefault(a["image_id"], []).append(a)
    ids = sorted(images)
    rng = np.random.default_rng(seed)
    H, W = image_hw
    while True:
        info = images[ids[int(rng.integers(0, len(ids)))]]
        h0, w0 = info["height"], info["width"]
        sx, sy = W / w0, H / h0
        batch = {
            "images": np.zeros((1, H, W, 3), np.float32),
            "gt_boxes": np.zeros((max_boxes, 4), np.float32),
            "gt_classes": np.zeros((max_boxes,), np.int32),
            "gt_valid": np.zeros((max_boxes,), np.float32),
        }
        path = os.path.join(image_root, info["file_name"])
        if os.path.exists(path):
            img = Image.open(path).convert("RGB").resize((W, H))
            batch["images"][0] = np.asarray(img, np.float32)
        words = [
            {"text": w["text"], "x0": w["x0"] * sx, "top": w["top"] * sy,
             "x1": w["x1"] * sx, "bottom": w["bottom"] * sy}
            for w in info.get("words", [])]
        batch["grid_ids"] = grid_ids_from_words(
            words, tokenize_fn, H, W)[None].astype(np.int32)
        for k, a in enumerate(anns.get(info["id"], [])[:max_boxes]):
            x, y, bw, bh = a["bbox"]
            batch["gt_boxes"][k] = [x * sx, y * sy, (x + bw) * sx,
                                    (y + bh) * sy]
            batch["gt_classes"][k] = max(int(a["category_id"]) - 1, 0)
            batch["gt_valid"][k] = 1.0
        yield batch


class GEMSwdeDataset:
    """Preprocessed SWDE page records (jsonl: per page tokenized node
    sequences — {"input_ids", "xpath_tags_seq", "xpath_subs_seq",
    "labels", optional "render_bbox"} — the shape of the reference
    run_swde/run.py load_and_cache_one_website features)."""

    def __init__(self, manifest: str):
        import json

        self.rows = []
        with open(manifest, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.rows.append(json.loads(line))

    def __len__(self):
        return len(self.rows)


def gem_swde_batches(
    dataset: GEMSwdeDataset,
    batch_size: int,
    max_seq: int = 384,
    xpath_depth: int = 50,
    use_render_bbox: bool = True,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """SWDE fine-tune batches: pad token/xpath sequences to max_seq; label
    padding carries -100 (ignored by the CE)."""
    rng = np.random.default_rng(seed)
    S, D = max_seq, xpath_depth
    while True:
        batch = {
            "input_ids": np.zeros((batch_size, S), np.int32),
            "attention_mask": np.zeros((batch_size, S), np.int32),
            "xpath_tags_seq": np.zeros((batch_size, S, D), np.int32),
            "xpath_subs_seq": np.zeros((batch_size, S, D), np.int32),
            "labels": np.full((batch_size, S), -100, np.int32),
        }
        if use_render_bbox:
            batch["render_bbox"] = np.zeros((batch_size, S, 4), np.float32)
        for b in range(batch_size):
            r = dataset.rows[int(rng.integers(0, len(dataset)))]
            n = min(len(r["input_ids"]), S)
            batch["input_ids"][b, :n] = r["input_ids"][:n]
            batch["attention_mask"][b, :n] = 1
            tags = np.asarray(r["xpath_tags_seq"], np.int32)[:n, :D]
            subs = np.asarray(r["xpath_subs_seq"], np.int32)[:n, :D]
            batch["xpath_tags_seq"][b, :n, : tags.shape[1]] = tags
            batch["xpath_subs_seq"][b, :n, : subs.shape[1]] = subs
            batch["labels"][b, :n] = r["labels"][:n]
            if use_render_bbox and "render_bbox" in r:
                bb = np.asarray(r["render_bbox"], np.float32)[:n]
                batch["render_bbox"][b, :n] = bb
        yield batch


def gem_websrc_batches(
    dataset: GEMSwdeDataset,
    batch_size: int,
    max_seq: int = 384,
    xpath_depth: int = 50,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """WebSRC span-QA batches (reference run_websrc/run.py squad-style
    features): rows additionally carry start_position/end_position token
    indices; positions past max_seq clamp to 0 (the reference maps
    truncated answers to the CLS index)."""
    rng = np.random.default_rng(seed)
    S, D = max_seq, xpath_depth
    while True:
        batch = {
            "input_ids": np.zeros((batch_size, S), np.int32),
            "attention_mask": np.zeros((batch_size, S), np.int32),
            "xpath_tags_seq": np.zeros((batch_size, S, D), np.int32),
            "xpath_subs_seq": np.zeros((batch_size, S, D), np.int32),
            "start_positions": np.zeros((batch_size,), np.int32),
            "end_positions": np.zeros((batch_size,), np.int32),
        }
        for b in range(batch_size):
            r = dataset.rows[int(rng.integers(0, len(dataset)))]
            n = min(len(r["input_ids"]), S)
            batch["input_ids"][b, :n] = r["input_ids"][:n]
            batch["attention_mask"][b, :n] = 1
            tags = np.asarray(r["xpath_tags_seq"], np.int32)[:n, :D]
            subs = np.asarray(r["xpath_subs_seq"], np.int32)[:n, :D]
            batch["xpath_tags_seq"][b, :n, : tags.shape[1]] = tags
            batch["xpath_subs_seq"][b, :n, : subs.shape[1]] = subs
            sp = int(r.get("start_position", 0))
            ep = int(r.get("end_position", 0))
            batch["start_positions"][b] = sp if sp < n else 0
            batch["end_positions"][b] = ep if ep < n else 0
        yield batch


def prefetch_batches(batches: Iterator[Dict[str, np.ndarray]],
                     size: int = 2,
                     sharding=None) -> Iterator[Any]:
    """Background-thread prefetcher: keeps up to `size` batches ahead of
    the consumer, with `jax.device_put` (against `sharding` when given)
    already issued on the producer side. The reference relies on torch
    DataLoader worker processes for this overlap; on TPU the fit loop's
    async dispatch hides device time, but the host-side batch assembly
    (LMDB read + decode + augment + collate) still serializes with step
    dispatch unless it runs ahead on another thread — numpy/PIL/transfer
    all release the GIL.

    Exceptions in the source iterator propagate to the consumer at the
    matching `next()`. The thread is a daemon and also exits when the
    consumer drops the iterator (queue slots freed by garbage collection).
    """
    import queue
    import threading

    from advancedliteratemachinery_tpu.parallel import multihost

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    _END = object()

    def produce():
        try:
            for batch in batches:
                if sharding is not None:
                    # pod-safe placement (make_array_from_process_local_data
                    # on multi-process; plain device_put otherwise)
                    batch = multihost.put_host_batch(batch, sharding)
                q.put(batch)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            q.put((_END, e))
            return
        q.put((_END, None))

    t = threading.Thread(target=produce, daemon=True)
    t.start()

    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
            if item[1] is not None:
                raise item[1]
            return
        yield item

"""WebRPG training-cache builder.

Parity target: reference DocumentUnderstanding/WebRPG/
create_webrpg_data_2.py — runs MarkupLM over tokenized pages/elements
and caches text + xpath embeddings (h5py there; one .npz per page here,
the format engine.batches.WebRPGCacheDataset consumes: param_ids,
global_text, element_text, chrlen, xpath, element_mask).

Input: a jsonl of page records
  {"page_ids": [...], "page_xpath_tags": [[depth]...],
   "page_xpath_subs": [[depth]...],
   "elements": [{"text_ids": [...], "xpath_tags": [depth],
                 "xpath_subs": [depth], "chrlen": int,
                 "param_ids": [...]}]}
The MarkupLM encoder is the package's GEMEncoder (import released
MarkupLM weights via engine.checkpoint.import_gem_markuplm first for
reference-equivalent embeddings).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def _encode(model, variables, ids, tags, subs, max_seq: int):
    import jax.numpy as jnp

    S = max_seq
    D = np.asarray(tags).shape[-1]
    n = min(len(ids), S)
    batch = {
        "input_ids": np.zeros((1, S), np.int32),
        "attention_mask": np.zeros((1, S), np.int32),
        "xpath_tags_seq": np.zeros((1, S, D), np.int32),
        "xpath_subs_seq": np.zeros((1, S, D), np.int32),
    }
    batch["input_ids"][0, :n] = np.asarray(ids[:n], np.int32)
    batch["attention_mask"][0, :n] = 1
    batch["xpath_tags_seq"][0, :n] = np.asarray(tags, np.int32)[:n]
    batch["xpath_subs_seq"][0, :n] = np.asarray(subs, np.int32)[:n]
    hidden = model.apply(variables, {k: jnp.asarray(v)
                                     for k, v in batch.items()})
    hidden = np.asarray(hidden, np.float32)[0]
    mask = batch["attention_mask"][0, :, None].astype(np.float32)
    # mean-pool over the valid tokens (the reference caches MarkupLM
    # sequence outputs and pools downstream; a fixed pooled vector per
    # element is the shape our AR model consumes)
    return (hidden * mask).sum(0) / max(mask.sum(), 1.0)


def build_webrpg_cache(manifest: str, out_dir: str, model=None,
                       variables=None, max_seq: int = 128,
                       log=print) -> List[str]:
    """jsonl pages → one .npz per page in out_dir. When model/variables
    are omitted a randomly-initialized GEMEncoder is used (layout
    correct; import MarkupLM weights for reference-equivalent values)."""
    import jax
    import jax.numpy as jnp

    from advancedliteratemachinery_tpu.models.gem import (
        GEMConfig, GEMEncoder, XPathEmbedding)

    if model is None:
        cfg = GEMConfig(use_render_bbox=False)
        model = GEMEncoder(cfg)
    cfg = model.config

    pages = []
    with open(manifest, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                pages.append(json.loads(line))
    if variables is None and pages:
        p0 = pages[0]
        D = len(p0["elements"][0]["xpath_tags"])
        init_batch = {
            "input_ids": np.zeros((1, 4), np.int32),
            "attention_mask": np.ones((1, 4), np.int32),
            "xpath_tags_seq": np.zeros((1, 4, D), np.int32),
            "xpath_subs_seq": np.zeros((1, 4, D), np.int32),
        }
        variables = model.init(jax.random.PRNGKey(0),
                               {k: jnp.asarray(v)
                                for k, v in init_batch.items()})

    xpath_mod = XPathEmbedding(cfg, name="xpath")
    xpath_vars = {"params": variables["params"]["xpath"]}

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, page in enumerate(pages):
        elements = page["elements"]
        gt = _encode(model, variables, page["page_ids"],
                     page["page_xpath_tags"], page["page_xpath_subs"],
                     max_seq)
        etexts, xpaths, chrlens, params = [], [], [], []
        for el in elements:
            etexts.append(_encode(
                model, variables, el["text_ids"],
                [el["xpath_tags"]] * len(el["text_ids"]),
                [el["xpath_subs"]] * len(el["text_ids"]), max_seq))
            xe = xpath_mod.apply(
                xpath_vars,
                jnp.asarray(np.asarray(el["xpath_tags"],
                                       np.int32)[None, None]),
                jnp.asarray(np.asarray(el["xpath_subs"],
                                       np.int32)[None, None]))
            xpaths.append(np.asarray(xe, np.float32)[0, 0])
            chrlens.append(int(el["chrlen"]))
            params.append(np.asarray(el["param_ids"], np.int32))
        rec = {
            "param_ids": np.stack(params),
            "global_text": gt[None],
            "element_text": np.stack(etexts),
            "chrlen": np.asarray(chrlens, np.int32),
            "xpath": np.stack(xpaths),
            "element_mask": np.ones(len(elements), np.float32),
        }
        dst = os.path.join(out_dir, f"page_{i:06d}.npz")
        np.savez(dst, **rec)
        written.append(dst)
    log(f"[webrpg-cache] {len(written)} pages → {out_dir}")
    return written

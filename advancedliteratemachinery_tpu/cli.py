"""Command-line entry points.

Replaces the reference's per-project CLI scripts (train*.py / test*.py /
demo.py / example.py — SURVEY.md §1 "public interface") with one
`python -m advancedliteratemachinery_tpu.cli <command>`:

  models                       list registered models/codecs/modules
  recognize IMG [IMG...]       word-crop recognition (mgp_str/lister/levocr)
  read / structurize / table   page pipelines → JSON (+ --visualize)
  table-html IMG               OmniParser table recognition → HTML
  table-eval DATA.jsonl        PubTabNet TEDS / S-TEDS evaluation
  convert DOC                  whole image/PDF → per-page JSON
  train MODEL ...              launch/resume training (13 models, one driver)
  eval --data LMDB...          STR benchmark suite (per-set + weighted acc)
  eval-det DT.json GT.json     COCO-protocol detection mAP
  ccocr-eval INDEX PRED GT     CC-OCR LMM benchmark harness
  ccocr-collect INDEX OUT      run a model over a CC-OCR tree → responses
  create-lmdb GT OUT           build an STR LMDB from path\\tlabel lines
  import-ckpt FAMILY PTH OUT   reference torch/safetensors → Orbax
  augment-preview IMG          per-op augmentation contact sheet
  bench                        the repo benchmark (same as bench.py)

Checkpoints: --ckpt loads an Orbax checkpoint; --torch-ckpt /
--init-torch-ckpt imports reference .pth / .safetensors / sharded-HF
artifacts via the per-family importers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_image(path: str):
    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def cmd_models(args) -> int:
    # importing the packages populates the registries
    import advancedliteratemachinery_tpu.codecs  # noqa: F401
    import advancedliteratemachinery_tpu.models  # noqa: F401
    import advancedliteratemachinery_tpu.pipelines  # noqa: F401
    from advancedliteratemachinery_tpu.core.registry import (
        CODECS,
        MODELS,
        PIPELINE_MODULES,
    )

    print("models:  ", ", ".join(MODELS))
    print("codecs:  ", ", ".join(CODECS))
    print("modules: ", ", ".join(PIPELINE_MODULES))
    if getattr(args, "cost", None):
        _print_model_cost(args.cost, args.variant)
    return 0


def _print_model_cost(name: str, variant: str) -> None:
    """Params + estimated forward GFLOPs for one recognition model — the
    reference's cost probes (MGP-STR test_final.py:391 get_flops, LISTER
    model_cost.py)."""
    import jax
    import jax.numpy as jnp

    from advancedliteratemachinery_tpu.utils.profiling import flops_estimate

    if name == "mgp_str":
        from advancedliteratemachinery_tpu.models.mgp_str import (
            MGPSTR, MGPSTRConfig)

        model = MGPSTR(MGPSTRConfig(variant=variant))
        x = jnp.zeros((1, 32, 128, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
        fwd = lambda p: model.apply({"params": p}, x)  # noqa: E731
    elif name == "lister":
        from advancedliteratemachinery_tpu.models.lister import (
            LISTER, LISTERConfig)

        model = LISTER(LISTERConfig(variant=variant))
        x = jnp.zeros((1, 32, 128, 3))
        mask = jnp.ones((1, 32, 128))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, mask)
        fwd = lambda p: model.apply(p, x, mask)  # noqa: E731
    else:
        print(f"cost: unsupported model {name!r} (mgp_str, lister)")
        return
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    flops = flops_estimate(fwd, params)
    print(f"cost[{name}-{variant}]: params={n_params / 1e6:.2f}M"
          + (f"  fwd={flops / 1e9:.2f} GFLOPs (B=1 32x128)"
             if flops else ""))


def _cfg_overrides(cfg, json_str):
    """Apply a JSON dict of (possibly nested) field overrides to a frozen
    ConfigBase dataclass — the `--config-json` escape hatch that lets the
    parity-rehearsal commands (docs/PARITY.md) run the exact released
    command line against reduced-dimension fixture checkpoints."""
    if not json_str:
        return cfg
    import dataclasses
    import typing

    def apply(c, d):
        fields = {f.name: f for f in dataclasses.fields(c)}
        try:
            hints = typing.get_type_hints(type(c))
        except Exception:          # string annotations that don't resolve
            hints = {}
        kw = {}
        for k, v in d.items():
            if k not in fields:
                raise ValueError(f"{type(c).__name__}: unknown config "
                                 f"field {k!r}; valid: {sorted(fields)}")
            cur = getattr(c, k)
            if isinstance(v, dict) and dataclasses.is_dataclass(cur):
                v = apply(cur, v)
            elif isinstance(v, dict):
                # None default with a dataclass annotation (e.g.
                # MGPSTRConfig.vit): construct the sub-config fresh
                hint = hints.get(k)
                if isinstance(hint, type) and dataclasses.is_dataclass(hint):
                    v = apply(hint(), v)
            elif isinstance(v, list) and (cur is None
                                          or isinstance(cur, tuple)):
                v = tuple(v)
            kw[k] = v
        return dataclasses.replace(c, **kw)

    return apply(cfg, json.loads(json_str))


def _mgp_engine(args):
    import jax
    import jax.numpy as jnp

    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
    from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig

    L = getattr(args, "batch_max_length", None) or 25
    cfg = MGPSTRConfig(variant=args.variant, batch_max_length=L)
    cfg = _cfg_overrides(cfg, getattr(args, "config_json", None))
    model = MGPSTR(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3)))["params"]
    if getattr(args, "torch_ckpt", None):
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            import_mgp_str,
            load_torch_state_dict,
        )
        import numpy as np

        params = import_mgp_str(load_torch_state_dict(args.torch_ckpt),
                                jax.tree.map(np.asarray, params))
    elif getattr(args, "ckpt", None):
        from advancedliteratemachinery_tpu.engine.checkpoint import load_params_checkpoint

        params = load_params_checkpoint(args.ckpt, params)
    return MGPSTRInference(model, params, CharCodec())


def _rec_engine(args):
    """recognize --model {mgp_str,lister,levocr}: all three STR
    recognizers share the recognize() -> [(text, conf, tag)] protocol."""
    model_name = getattr(args, "model", "mgp_str")
    if model_name == "mgp_str":
        return _mgp_engine(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advancedliteratemachinery_tpu.engine.checkpoint import (
        TORCH_IMPORTERS,
        load_params_checkpoint,
        load_torch_state_dict,
    )

    if model_name == "lister":
        from advancedliteratemachinery_tpu.engine.infer import LISTERInference
        from advancedliteratemachinery_tpu.models.lister import (
            LISTER, LISTERConfig)

        cfg = _cfg_overrides(LISTERConfig(variant=args.variant),
                             getattr(args, "config_json", None))
        m = LISTER(cfg)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)),
                        jnp.ones((1, 32, 128)))["params"]
        if getattr(args, "torch_ckpt", None):
            params = TORCH_IMPORTERS["lister"](
                load_torch_state_dict(args.torch_ckpt),
                jax.tree.map(np.asarray, params))
        elif getattr(args, "ckpt", None):
            params = load_params_checkpoint(args.ckpt, params)
        return LISTERInference(m, params)

    from advancedliteratemachinery_tpu.engine.infer import LevOCRInference
    from advancedliteratemachinery_tpu.models.levocr import (
        LevOCR, LevOCRConfig, LevtDictionary)

    cfg = _cfg_overrides(LevOCRConfig(),
                         getattr(args, "config_json", None))
    m = LevOCR(cfg)
    d = LevtDictionary(max_len=cfg.max_len)
    tok = jnp.asarray(d.encode([""]))
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)),
                       tok, tok, train=False)
    if getattr(args, "torch_ckpt", None):
        variables = TORCH_IMPORTERS["levocr"](
            load_torch_state_dict(args.torch_ckpt),
            jax.tree.map(np.asarray, dict(variables)))
    elif getattr(args, "ckpt", None):
        variables = load_params_checkpoint(args.ckpt, dict(variables))
    return LevOCRInference(m, variables)


def cmd_recognize(args) -> int:
    import cv2
    import numpy as np

    engine = _rec_engine(args)
    crops = []
    for path in args.images:
        img = _load_image(path)
        crops.append(cv2.resize(img, (128, 32)))
    results = engine.recognize(np.stack(crops))
    for path, (text, conf, head) in zip(args.images, results):
        print(json.dumps({"image": path, "text": text,
                          "confidence": round(conf, 4), "head": head}))
    return 0


def _db_detect_fn(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advancedliteratemachinery_tpu.models.db import (
        DBConfig,
        DBDetector,
        extract_boxes,
    )

    model = DBDetector(DBConfig())
    H = W = 640
    vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    fn = jax.jit(lambda v, x: model.apply(v, x)["prob"])

    def detect(image):
        import cv2

        h, w = image.shape[:2]
        x = cv2.resize(image, (W, H)).astype(np.float32) / 255.0
        prob = np.asarray(fn(vars_, jnp.asarray(x[None])))[0, :, :, 0]
        quads, scores = extract_boxes(prob, box_thresh=args.det_thresh)
        if len(quads):
            quads = quads * np.tile([w / W, h / H], 4)
        return quads.astype(np.float32), scores

    return detect


def cmd_read(args) -> int:
    from advancedliteratemachinery_tpu.pipelines.document import GeneralTextReading
    from advancedliteratemachinery_tpu.pipelines.modules import (
        TextDetection,
        TextRecognition,
    )

    engine = _rec_engine(args)
    pipe = GeneralTextReading(TextDetection(_db_detect_fn(args)),
                              TextRecognition(engine.recognize))
    image = _load_image(args.image)
    out = pipe(image)
    if getattr(args, "visualize", None):
        from advancedliteratemachinery_tpu.utils.visualization import (
            draw_reading, save_image)

        save_image(draw_reading(image, out), args.visualize)
    print(json.dumps(out, indent=2, default=float))
    return 0


def cmd_structurize(args) -> int:
    import numpy as np

    from advancedliteratemachinery_tpu.pipelines.document import (
        DocumentStructurization,
    )
    from advancedliteratemachinery_tpu.pipelines.modules import (
        LayoutAnalysis,
        TextDetection,
        TextRecognition,
    )

    engine = _rec_engine(args)

    def whole_page_layout(image):
        h, w = image.shape[:2]
        return (np.asarray([[0, 0, w, 0, w, h, 0, h]], np.float32),
                np.asarray([1.0]), np.asarray([2]))

    formula = None
    if getattr(args, "formula_onnx", None):
        from advancedliteratemachinery_tpu.pipelines.modules import (
            FormulaRecognition)
        formula = FormulaRecognition.from_onnx(args.formula_onnx)

    pipe = DocumentStructurization(
        LayoutAnalysis(whole_page_layout),
        TextDetection(_db_detect_fn(args)),
        TextRecognition(engine.recognize),
        formula_recognition=formula)
    image = _load_image(args.image)
    out = pipe(image)
    if getattr(args, "visualize", None):
        from advancedliteratemachinery_tpu.utils.visualization import (
            draw_structurization, save_image)

        save_image(draw_structurization(image, out), args.visualize)
    print(json.dumps(out, indent=2, default=float))
    return 0


def cmd_table(args) -> int:
    """Table parsing: LORE cells + logical coords, DB det + MGP-STR rec per
    cell → HTML (reference DocXChain example.py table_parsing_example)."""
    from advancedliteratemachinery_tpu.pipelines.document import TableParsing
    from advancedliteratemachinery_tpu.pipelines.modules import (
        TableStructureRecognition,
        TextDetection,
        TextRecognition,
    )

    engine = _rec_engine(args)
    pipe = TableParsing(TableStructureRecognition(_lore_table_fn(args)),
                        TextDetection(_db_detect_fn(args)),
                        TextRecognition(engine.recognize))
    image = _load_image(args.image)
    out = pipe(image)
    if getattr(args, "visualize", None):
        from advancedliteratemachinery_tpu.utils.visualization import (
            draw_table, save_image)

        save_image(draw_table(image, out), args.visualize)
    print(json.dumps(out, indent=2, default=float))
    return 0


def cmd_vie(args) -> int:
    """Key-information extraction over one page image: OmniParser VIE
    decode → entity JSON (reference main.py --eval with --infer_vie +
    engine/val.py:39-44 per-image json dump)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advancedliteratemachinery_tpu.codecs.coords import (
        CORD_CLASSES, SROIE_CLASSES)
    from advancedliteratemachinery_tpu.eval.spotting_eval import (
        decode_vie_outputs)
    from advancedliteratemachinery_tpu.models.omniparser import (
        OmniParser, OmniParserConfig)

    classes = CORD_CLASSES if args.class_set == "cord" else SROIE_CLASSES
    cfg = OmniParserConfig(swin_variant=args.variant,
                           vie_categories=len(classes))
    v = cfg.vocab()
    model = OmniParser(cfg)
    size = args.image_size
    seqs0 = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
    variables = jax.jit(lambda k, x: model.init(k, x, seqs0))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    if args.torch_ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            TORCH_IMPORTERS, load_torch_state_dict)

        variables = {"params": TORCH_IMPORTERS["omniparser"](
            load_torch_state_dict(args.torch_ckpt),
            jax.tree.map(np.asarray, variables["params"]))}
    elif args.ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            load_params_checkpoint)

        variables = load_params_checkpoint(args.ckpt, variables)

    image = _load_image(args.image)
    orig_h, orig_w = image.shape[:2]
    from PIL import Image as PILImage

    resized = np.asarray(PILImage.fromarray(image).resize((size, size)),
                         np.float32)
    x = jnp.asarray(resized[None] / 255.0 * 2.0 - 1.0)
    out = jax.jit(lambda vv, xx: model.apply(vv, xx,
                                             method=model.infer_vie))(
        variables, x)
    out = {k: np.asarray(val) for k, val in out.items()}
    entities = decode_vie_outputs(out, v, classes, (orig_h, orig_w))
    print(json.dumps({"image": args.image, "entities": entities},
                     indent=2, default=float))
    return 0


def _build_table_model(args):
    """OmniParser with the table class band + loaded params → (model,
    vocab, variables, jitted infer over a resized uint8 page)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advancedliteratemachinery_tpu.data.pubtabnet import N_TABLE_CLASSES
    from advancedliteratemachinery_tpu.models.omniparser import (
        OmniParser, OmniParserConfig)
    from advancedliteratemachinery_tpu.ops.image import normalize_crops

    cfg = OmniParserConfig(swin_variant=args.variant,
                           vie_categories=N_TABLE_CLASSES)
    v = cfg.vocab()
    model = OmniParser(cfg)
    size = args.image_size
    seqs0 = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
    variables = jax.jit(lambda k, x: model.init(k, x, seqs0))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    if args.torch_ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            TORCH_IMPORTERS, load_torch_state_dict)

        variables = {"params": TORCH_IMPORTERS["omniparser"](
            load_torch_state_dict(args.torch_ckpt),
            jax.tree.map(np.asarray, variables["params"]))}
    elif args.ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            load_params_checkpoint)

        variables = load_params_checkpoint(args.ckpt, variables)

    infer = jax.jit(lambda vv, xx: model.apply(
        vv, normalize_crops(xx, dtype=jnp.float32),
        method=model.infer_vie))

    def run_page(page_u8: "np.ndarray") -> dict:
        out = infer(variables, jnp.asarray(page_u8[None]))
        return {k: np.asarray(val) for k, val in out.items()}

    return model, v, variables, run_page


def cmd_table_html(args) -> int:
    """Table recognition over one table image: OmniParser TR decode →
    PubTabNet-dialect HTML (the unified third task — the reference repo
    reports its PubTabNet numbers but ships no TR code; see
    data/pubtabnet.py for the triplet scheme)."""
    import numpy as np

    from advancedliteratemachinery_tpu.data.pubtabnet import (
        decode_table_outputs)

    _, v, _, run_page = _build_table_model(args)
    image = _load_image(args.image)
    orig_h, orig_w = image.shape[:2]
    from PIL import Image as PILImage

    size = args.image_size
    resized = np.asarray(
        PILImage.fromarray(image).resize((size, size)), np.uint8)
    res = decode_table_outputs(run_page(resized), v, (orig_h, orig_w))
    print(json.dumps({"image": args.image, "html": res["html"],
                      "structure_html": res["structure_html"],
                      "cells": res["cells"]}, indent=2, default=float))
    return 0


def cmd_table_eval(args) -> int:
    """TEDS / S-TEDS over a PubTabNet-format jsonl (the reference's
    OmniParser README reports PubTabNet TEDS 88.83 / S-TEDS 90.45 for
    Swin-B; this is the matching evaluation loop: infer_vie per table
    image → HTML reconstruction → IBM TEDS vs the normalized GT HTML)."""
    import numpy as np
    from PIL import Image as PILImage

    from advancedliteratemachinery_tpu.data.pubtabnet import (
        PubTabNetDataset, decode_table_outputs)
    from advancedliteratemachinery_tpu.eval.teds import TEDS

    from advancedliteratemachinery_tpu.codecs.coords import PRINTABLE_CHARS

    ds = PubTabNetDataset(args.data, args.img_root or ".",
                          chars=PRINTABLE_CHARS,
                          split=args.split, max_samples=args.limit)
    if not len(ds):
        print(json.dumps({"error": "no samples matched",
                          "data": args.data, "split": args.split}))
        return 1
    _, v, _, run_page = _build_table_model(args)
    teds, steds = TEDS(), TEDS(structure_only=True)
    size = args.image_size
    t_sum = s_sum = 0.0
    per_sample = []
    for i in range(len(ds)):
        page = ds[i]
        path = os.path.join(page["image_folder"], page["file_name"])
        img = PILImage.open(path).convert("RGB").resize((size, size))
        res = decode_table_outputs(run_page(np.asarray(img, np.uint8)),
                                   v, page["orig_size"])
        t = teds.evaluate(res["html"], page["gt_html"])
        s = steds.evaluate(res["structure_html"], page["gt_html"])
        t_sum += t
        s_sum += s
        per_sample.append({"file": page["file_name"],
                           "teds": t, "s_teds": s})
    n = len(ds)
    summary = {"samples": n, "teds": t_sum / n, "s_teds": s_sum / n}
    if args.per_sample:
        summary["per_sample"] = per_sample
    print(json.dumps(summary, indent=2, default=float))
    return 0


def _lore_table_fn(args):
    import jax

    from advancedliteratemachinery_tpu.models.lore import (
        LORE,
        LoreConfig,
        make_table_predict_fn,
    )

    model = LORE(LoreConfig())
    variables = model.init_full(jax.random.PRNGKey(0), image_shape=(512, 512))
    if getattr(args, "ckpt", None):
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            load_params_checkpoint)
        variables = load_params_checkpoint(args.ckpt, variables)
    return make_table_predict_fn(model, variables,
                                 score_thresh=args.det_thresh)


def cmd_convert(args) -> int:
    """Whole-document (image or PDF) conversion → per-page JSON
    (reference example.py:164 whole_pdf_conversion_example)."""
    import numpy as np

    from advancedliteratemachinery_tpu.pipelines.document import (
        DocumentStructurization,
        convert_document,
    )
    from advancedliteratemachinery_tpu.pipelines.modules import (
        LayoutAnalysis,
        TextDetection,
        TextRecognition,
    )

    engine = _rec_engine(args)

    def whole_page_layout(image):
        h, w = image.shape[:2]
        return (np.asarray([[0, 0, w, 0, w, h, 0, h]], np.float32),
                np.asarray([1.0]), np.asarray([2]))

    pipe = DocumentStructurization(
        LayoutAnalysis(whole_page_layout),
        TextDetection(_db_detect_fn(args)),
        TextRecognition(engine.recognize))
    pages = convert_document(args.document, pipe, dpi=args.dpi)
    print(json.dumps(pages, indent=2, default=float))
    return 0


def cmd_augment_preview(args) -> int:
    """Apply every augmentation op to an image and write the results —
    the reference's visual smoke test (OCR/MGP-STR/augmentation/test.py).
    """
    import os

    import numpy as np
    from PIL import Image

    from advancedliteratemachinery_tpu.data.augment import GROUPS

    img = Image.fromarray(_load_image(args.image)).convert("RGB")
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    written = 0
    for group, ops in GROUPS.items():
        for op in ops:
            name = type(op).__name__
            out = op(img, mag=args.mag, rng=rng)
            out.save(os.path.join(args.out_dir, f"{group}_{name}.png"))
            written += 1
    print(json.dumps({"out_dir": args.out_dir, "images": written}))
    return 0


def cmd_bench(args) -> int:
    import runpy

    runpy.run_path("bench.py", run_name="__main__")
    return 0


def cmd_import_ckpt(args) -> int:
    """Convert a reference torch .pth into an Orbax checkpoint once; the
    other commands then load it with --ckpt. Families map to
    engine.checkpoint.TORCH_IMPORTERS."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advancedliteratemachinery_tpu.engine.checkpoint import (
        TORCH_IMPORTERS,
        load_torch_state_dict,
        save_checkpoint,
    )

    def _mgp():
        from advancedliteratemachinery_tpu.models.mgp_str import (
            MGPSTR, MGPSTRConfig)
        m = MGPSTR(MGPSTRConfig(variant=args.variant))
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)))
        return dict(v)["params"], TORCH_IMPORTERS["mgp_str"]

    def _lister():
        from advancedliteratemachinery_tpu.models.lister import (
            LISTER, LISTERConfig)
        m = LISTER(LISTERConfig(variant=args.variant))
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)),
                   jnp.ones((1, 32, 128)))
        return dict(v)["params"], TORCH_IMPORTERS["lister"]

    def _levocr():
        from advancedliteratemachinery_tpu.models.levocr import (
            LevOCR, LevOCRConfig, LevtDictionary)
        cfg = LevOCRConfig()
        m = LevOCR(cfg)
        d = LevtDictionary(max_len=cfg.max_len)
        tok = jnp.asarray(d.encode([""]))
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)), tok,
                   tok, train=False)
        return dict(v), TORCH_IMPORTERS["levocr"]

    def _lore():
        from advancedliteratemachinery_tpu.models.lore import LORE, LoreConfig
        m = LORE(LoreConfig())
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                   method=LORE.infer)
        full = dict(v)

        def importer(sd, variables):
            bb = TORCH_IMPORTERS["dla"](sd, {
                "params": dict(variables["params"]["backbone"]),
                "batch_stats": dict(variables["batch_stats"]["backbone"])})
            variables = {k: dict(variables[k]) for k in variables}
            variables["params"]["backbone"] = bb["params"]
            variables["batch_stats"]["backbone"] = bb["batch_stats"]
            return variables

        return full, importer

    def _geolayoutlm():
        from advancedliteratemachinery_tpu.models.geolayoutlm import (
            GeoLayoutLM, GeoLayoutLMConfig)
        m = GeoLayoutLM(GeoLayoutLMConfig())
        B, S, N = 1, 8, 2
        batch = dict(
            input_ids=jnp.zeros((B, S), jnp.int32),
            image=jnp.zeros((B, 768, 768, 3)),
            bbox_4p_normalized=jnp.zeros((B, S, 8)),
            bbox=jnp.zeros((B, S, 4), jnp.int32),
            attention_mask=jnp.ones((B, S)),
            first_token_idxes=jnp.zeros((B, N), jnp.int32),
            block_mask=jnp.ones((B, N)))
        v = m.init(jax.random.PRNGKey(0), batch)
        key = ("geolayoutlm_vie" if args.family == "geolayoutlm_vie"
               else "geolayoutlm_backbone")
        return dict(v)["params"], TORCH_IMPORTERS[key]

    def _omniparser():
        from advancedliteratemachinery_tpu.models.omniparser import (
            OmniParser, OmniParserConfig)
        m = OmniParser(OmniParserConfig())
        seqs = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), seqs)
        return dict(v)["params"], TORCH_IMPORTERS["omniparser"]

    def _vgt():
        from advancedliteratemachinery_tpu.models.rcnn import (
            CascadeConfig, VGTCascadeDetector)
        from advancedliteratemachinery_tpu.models.vgt import VGTConfig
        m = VGTCascadeDetector(VGTConfig(), CascadeConfig())
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
                   jnp.zeros((1, 224, 224), jnp.int32))
        return dict(v), TORCH_IMPORTERS["vgt_cascade"]

    def _docxlayout():
        from advancedliteratemachinery_tpu.models.docxlayout import (
            DocXLayout, DocXLayoutConfig)
        m = DocXLayout(DocXLayoutConfig())
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
        return dict(v), TORCH_IMPORTERS["docxlayout"]

    def _gem():
        from advancedliteratemachinery_tpu.models.gem import (
            GEMConfig, GEMEncoder)
        cfg = GEMConfig()
        m = GEMEncoder(cfg)
        B, S = 1, 8
        batch = dict(
            input_ids=jnp.zeros((B, S), jnp.int32),
            attention_mask=jnp.ones((B, S)),
            xpath_tags_seq=jnp.zeros((B, S, cfg.max_xpath_depth), jnp.int32),
            xpath_subs_seq=jnp.zeros((B, S, cfg.max_xpath_depth), jnp.int32))
        v = m.init(jax.random.PRNGKey(0), batch)
        return dict(v)["params"], TORCH_IMPORTERS["gem_markuplm"]

    def _vlpt():
        from advancedliteratemachinery_tpu.models.vlpt import VLPT, VLPTConfig
        cfg = VLPTConfig()
        m = VLPT(cfg)
        B, T = 1, cfg.max_text_len
        batch = dict(
            image=jnp.zeros((B, cfg.image_size, cfg.image_size, 3)),
            text_ids=jnp.zeros((B, T), jnp.int32),
            text_ids_mlm=jnp.zeros((B, T), jnp.int32),
            text_labels_mlm=jnp.full((B, T), -100, jnp.int32),
            text_masks=jnp.ones((B, T), jnp.int32))
        v = m.init(jax.random.PRNGKey(0), batch)
        return dict(v), TORCH_IMPORTERS["vlpt"]

    builders = {"mgp_str": _mgp, "lister": _lister, "levocr": _levocr,
                "lore": _lore, "geolayoutlm_backbone": _geolayoutlm,
                "geolayoutlm_vie": _geolayoutlm, "omniparser": _omniparser,
                "vgt_cascade": _vgt, "docxlayout": _docxlayout,
                "gem_markuplm": _gem, "vlpt": _vlpt}
    template, importer = builders[args.family]()
    sd = load_torch_state_dict(args.torch_ckpt)
    imported = importer(sd, jax.tree.map(np.asarray, template))
    save_checkpoint(args.out, imported)
    n = len(jax.tree.leaves(imported))
    print(json.dumps({"family": args.family, "out": args.out, "leaves": n}))
    return 0


def cmd_eval(args) -> int:
    """STR benchmark suite: per-set + weighted total word accuracy over
    LMDB eval dirs (reference test_final.py:29 benchmark_all_eval /
    LISTER test.py:23 / LevOCR eval.py:21)."""
    from advancedliteratemachinery_tpu.eval.str_eval import benchmark_all_eval

    engine = _rec_engine(args)
    out = benchmark_all_eval(engine.recognize, args.data,
                             charset=args.charset,
                             max_length=args.batch_max_length,
                             batch_size=args.batch_size)
    print(json.dumps(out, indent=2, default=float))
    return 0


def cmd_ccocr_eval(args) -> int:
    """CC-OCR LMM benchmark harness over a predictions directory
    (reference Benchmarks/CC-OCR/evaluation/main.py: index-driven
    per-dataset evaluators + overall summary)."""
    import os

    from advancedliteratemachinery_tpu.eval.ccocr_harness import (
        evaluate_and_summary,
        load_response_from_dir,
    )

    def load_any(path):
        if os.path.isdir(path):
            return load_response_from_dir(path)
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    with open(args.index, encoding="utf-8") as f:
        index = json.load(f)
    responses, gts = {}, {}
    for item in index:
        name = item["dataset"]
        pdt = os.path.join(args.pred_dir, name)
        gt = os.path.join(args.gt_dir, name)
        if os.path.exists(pdt) and os.path.exists(gt):
            responses[name] = load_any(pdt)
            gts[name] = load_any(gt)
        elif os.path.exists(pdt + ".json") and os.path.exists(gt + ".json"):
            responses[name] = load_any(pdt + ".json")
            gts[name] = load_any(gt + ".json")
    out = evaluate_and_summary(index, responses, gts,
                               weighted=args.weighted)
    print(json.dumps(out, indent=2, default=float))
    return 0


def cmd_ccocr_collect(args) -> int:
    """Prediction collection over a CC-OCR-format benchmark tree
    (reference Benchmarks/CC-OCR/example.py): per released dataset, run a
    model on each qa.jsonl entry and write the per-image response JSONs
    that `ccocr-eval` consumes, with resume + parallel workers."""
    import os

    from advancedliteratemachinery_tpu.eval.ccocr_harness import (
        collect_predictions,
    )

    spec = args.model
    if spec == "dummy":
        model_fn = lambda image_path, question: ""           # noqa: E731
    elif spec == "pipeline":
        from argparse import Namespace

        from advancedliteratemachinery_tpu.pipelines.document import (
            GeneralTextReading,
        )
        from advancedliteratemachinery_tpu.pipelines.modules import (
            TextDetection,
            TextRecognition,
        )

        sub = Namespace(model="mgp_str", variant="base",
                        ckpt=getattr(args, "ckpt", None),
                        torch_ckpt=None, charset=None, batch_max_length=25)
        pipe = GeneralTextReading(TextDetection(_db_detect_fn(sub)),
                                  TextRecognition(_rec_engine(sub).recognize))

        def model_fn(image_path, question):
            out = pipe(_load_image(image_path))
            return "\n".join(inst.get("text", "")
                             for inst in out.get("instances", []))
    elif spec.startswith("import:"):
        import importlib

        mod_name, _, attr = spec[len("import:"):].rpartition(":")
        model_fn = getattr(importlib.import_module(mod_name), attr)
    else:
        raise SystemExit(f"unknown --model {spec!r} (pipeline | dummy | "
                         f"import:module:attr)")

    with open(args.index, encoding="utf-8") as f:
        index = json.load(f)
    # reference path resolution: dataset base_dirs are relative to the
    # index file's grandparent (example.py: dirname(dirname(index_path)))
    base = args.base_dir or os.path.dirname(
        os.path.dirname(os.path.abspath(args.index)))
    stats = collect_predictions(
        index, base_dir=base,
        output_dir=args.output_dir, model_fn=model_fn,
        model_name=args.model_name or args.model.replace(":", "_"),
        workers=args.workers, resume=not args.no_resume)
    print(json.dumps(stats, indent=2))
    return 0


def cmd_pdf_grid(args) -> int:
    """PDF text layer → per-page VGT grid inputs (reference
    DocumentUnderstanding/VGT/object_detection/create_grid_input.py:
    pdfplumber extract_words → create_grid_dict → pkl per page). Here
    the word extraction is the package's dependency-free PDF parser
    (pipelines/pdf_text.py) and output is one .npz per page with the
    same keys (input_ids, bbox_subword_list, texts, bbox_texts_list)
    plus the page size for coordinate scaling."""
    import os

    import numpy as np

    from advancedliteratemachinery_tpu.models.vgt import build_grid_input
    from advancedliteratemachinery_tpu.pipelines.pdf_text import (
        extract_pdf_page_sizes,
        extract_pdf_words,
    )

    if args.vocab:
        from advancedliteratemachinery_tpu.codecs.subword import (
            WordpieceCodec)

        tok = WordpieceCodec.from_file(args.vocab).encode_text
        tokenize_fn = lambda texts: [tok(t) for t in texts]   # noqa: E731
    else:
        # vocab-free fallback: stable per-byte ids (grid geometry is
        # exact; ids only need to be consistent for training)
        tokenize_fn = lambda texts: [                          # noqa: E731
            [200 + b for b in t.encode("utf-8")[:8]] or [0] for t in texts]

    os.makedirs(args.output_dir, exist_ok=True)
    pages = extract_pdf_words(args.pdf)
    sizes = extract_pdf_page_sizes(args.pdf)
    stem = os.path.splitext(os.path.basename(args.pdf))[0]
    for i, (words, (w, h)) in enumerate(zip(pages, sizes)):
        grid = build_grid_input(words, tokenize_fn)
        out = os.path.join(args.output_dir, f"{stem}_page_{i}.npz")
        np.savez(out,
                 input_ids=grid["input_ids"],
                 bbox_subword_list=grid["bbox_subword_list"],
                 texts=np.asarray(grid["texts"], dtype=object),
                 bbox_texts_list=grid["bbox_texts_list"],
                 page_size=np.asarray([w, h], np.float64))
        print(f"{out}: {len(grid['texts'])} words, "
              f"{len(grid['input_ids'])} tokens")
    return 0


def cmd_eval_det(args) -> int:
    """COCO-protocol detection scoring: detections JSON + ground-truth
    JSON → mAP/AP50/AP75 + per-category AP (the metric detectron2's
    COCOEvaluator reports for VGT — VGTTrainer.py:668)."""
    from advancedliteratemachinery_tpu.eval.det_map import coco_map

    with open(args.detections, encoding="utf-8") as f:
        dets = json.load(f)
    with open(args.ground_truth, encoding="utf-8") as f:
        gt = json.load(f)
    if isinstance(gt, dict):            # full COCO file → annotations
        gt = gt.get("annotations", gt)
    if isinstance(dets, dict):
        dets = dets.get("annotations", dets)
    print(json.dumps(coco_map(dets, gt), indent=2, default=float))
    return 0


def cmd_layout(args) -> int:
    """VGT layout detection: page images (+ optional pdf-grid .npz word
    grids) → COCO-format detections JSON, feeding `eval-det` — the
    reference inference path (VGT/inference.py: image + grid pkl →
    detectron2 predictor → instances). Detections are emitted in
    ORIGINAL image coordinates."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from advancedliteratemachinery_tpu.models.rcnn import (
        CascadeConfig,
        VGTCascadeDetector,
    )
    from advancedliteratemachinery_tpu.models.vgt import (
        VGTConfig,
        rasterize_word_grid,
    )

    cfg = _cfg_overrides(VGTConfig(), args.config_json)
    ccfg = _cfg_overrides(CascadeConfig(), args.cascade_json)
    S = args.image_size
    det = VGTCascadeDetector(cfg, ccfg)
    variables = det.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, S, S, 3)),
                         jnp.zeros((1, S, S), jnp.int32))
    if args.torch_ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            TORCH_IMPORTERS,
            load_torch_state_dict,
        )
        variables = TORCH_IMPORTERS["vgt_cascade"](
            load_torch_state_dict(args.torch_ckpt),
            jax.tree.map(np.asarray, dict(variables)),
            pooler_resolution=ccfg.pooler_resolution)
    elif args.ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            load_params_checkpoint)
        variables = load_params_checkpoint(args.ckpt, dict(variables))

    infer = jax.jit(lambda v, im, g: det.apply(v, im, g, train=False))
    detections = []
    for image_id, path in enumerate(args.images, start=1):
        img = Image.open(path).convert("RGB")
        W0, H0 = img.size
        arr = np.asarray(img.resize((S, S)), np.float32)[None]
        grid = np.zeros((1, S, S), np.int64)
        if args.grid_dir:
            stem = os.path.splitext(os.path.basename(path))[0]
            npz_path = os.path.join(args.grid_dir, stem + ".npz")
            if os.path.exists(npz_path):
                z = np.load(npz_path, allow_pickle=True)
                pw, ph = z["page_size"]
                b = z["bbox_subword_list"]
                if len(b):
                    sx, sy = S / float(pw), S / float(ph)
                    xyxy = np.stack([b[:, 0] * sx, b[:, 1] * sy,
                                     (b[:, 0] + b[:, 2]) * sx,
                                     (b[:, 1] + b[:, 3]) * sy], axis=1)
                    grid[0] = rasterize_word_grid(z["input_ids"], xyxy,
                                                  S, S, 1)
        out = infer(variables, jnp.asarray(arr), jnp.asarray(grid))
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        classes = np.asarray(out["classes"])
        valid = np.asarray(out["valid"])
        sx, sy = W0 / S, H0 / S
        for i in range(len(valid)):
            if not valid[i]:
                continue
            x0, y0, x1, y1 = boxes[i]
            detections.append({
                "image_id": image_id,
                "category_id": int(classes[i]) + 1,
                "bbox": [float(x0 * sx), float(y0 * sy),
                         float((x1 - x0) * sx), float((y1 - y0) * sy)],
                "score": float(scores[i]),
            })
    payload = json.dumps(detections, indent=2)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(payload)
        print(f"{args.out}: {len(detections)} detections over "
              f"{len(args.images)} pages")
    else:
        print(payload)
    return 0


def cmd_eval_funsd(args) -> int:
    """GeoLayoutLM FUNSD evaluation: preprocessed page jsons + checkpoint
    → entity-level SER F1 (+ RE link F1), the README metrics (reference
    geolayoutlm_vie_module.py:478 seqeval f1 over parse_str_from_seq;
    RE from logits4linking). Feed `preprocess-funsd` output."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advancedliteratemachinery_tpu.engine import batches as B
    from advancedliteratemachinery_tpu.eval.kie_metrics import bio_entity_f1
    from advancedliteratemachinery_tpu.models.geolayoutlm import (
        GeoLayoutLM,
        GeoLayoutLMConfig,
    )

    cfg = _cfg_overrides(GeoLayoutLMConfig(), args.config_json)
    model = GeoLayoutLM(cfg)
    class_names = tuple(args.class_names.split(","))
    bio_names = ["O"] + [f"{p}-{c}" for c in class_names
                         for p in ("B", "I")]

    ds = B.VIEPreprocessedDataset(args.data)
    it = B.vie_batches(ds, batch_size=1, max_seq=args.max_seq,
                       max_blocks=args.max_blocks, image_size=cfg.image_size,
                       cls_id=args.cls_id, class_names=class_names,
                       ordered=True)
    first = next(it)
    batches = [first]
    batches.extend(it)

    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in first.items()})
    if args.torch_ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            TORCH_IMPORTERS,
            load_torch_state_dict,
        )
        params = TORCH_IMPORTERS["geolayoutlm_vie"](
            load_torch_state_dict(args.torch_ckpt),
            jax.tree.map(np.asarray, variables["params"]))
    elif args.ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            load_params_checkpoint)
        params = load_params_checkpoint(args.ckpt, variables["params"])
    else:
        params = variables["params"]

    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b,
                                           deterministic=True))
    gt_seqs, pr_seqs = [], []
    link_tp = link_fp = link_fn = 0
    for b in batches:
        out = fwd(params, {k: jnp.asarray(v) for k, v in b.items()})
        logits = np.asarray(out["logits4labeling"])[0]
        labels = b["bio_labels"][0]
        valid = labels >= 0
        gt_seqs.append([bio_names[i] for i in labels[valid]])
        pr_seqs.append([bio_names[i] for i in logits.argmax(-1)[valid]])
        # RE: block-linking predictions vs el_labels_blk
        link_logits = np.asarray(out["logits4linking_list"][-1])[0]
        mask = b["el_label_blk_mask"][0] > 0
        pred_link = (link_logits > 0) & mask
        gold_link = (b["el_labels_blk"][0] > 0) & mask
        link_tp += int((pred_link & gold_link).sum())
        link_fp += int((pred_link & ~gold_link).sum())
        link_fn += int((~pred_link & gold_link).sum())
    ser = bio_entity_f1(gt_seqs, pr_seqs)
    lp = link_tp / max(link_tp + link_fp, 1)
    lr = link_tp / max(link_tp + link_fn, 1)
    re_f1 = 2 * lp * lr / max(lp + lr, 1e-9)
    print(json.dumps({"ser": ser,
                      "re": {"precision": lp, "recall": lr, "f1": re_f1},
                      "pages": len(batches)}, indent=2, default=float))
    return 0


def cmd_create_lmdb(args) -> int:
    from advancedliteratemachinery_tpu.data.lmdb_writer import create_str_lmdb

    n = create_str_lmdb(args.gt_file, args.out_dir, root=args.root,
                        check_valid=not args.no_check)
    print(json.dumps({"out_dir": args.out_dir, "num_samples": n}))
    return 0


def cmd_serve(args) -> int:
    """HTTP recognition service (engine/http_serving.py): concurrent
    clients coalesce into fixed-shape TPU forwards through the
    ContinuousBatcher. The reference has no serving surface to mirror;
    this is the deployment front of the TPU framework."""
    from advancedliteratemachinery_tpu.engine.http_serving import (
        RecognitionHTTPServer)

    engine = _rec_engine(args)
    detect_fn = _db_detect_fn(args) if args.with_detector else None
    server = RecognitionHTTPServer(
        engine, batch_size=args.batch_size, max_wait_ms=args.max_wait_ms,
        host=args.host, port=args.port, detect_fn=detect_fn,
        model_name=args.model)
    print(f"serving {args.model}/{args.variant} on "
          f"http://{args.host}:{server.port}  "
          f"(POST /v1/recognize{', /v1/read' if detect_fn else ''})",
          flush=True)
    server.serve_forever()
    return 0


def _train_augment(args):
    """--rand-aug → a RandAugment instance (reference --isrand_aug,
    dataset.py:261-345: augs_num groups, intact_prob skip), else None."""
    if not getattr(args, "rand_aug", False):
        return None
    from advancedliteratemachinery_tpu.data.augment import RandAugment
    return RandAugment(num_groups=args.augs_num,
                       intact_prob=args.intact_prob, seed=args.seed)


def cmd_preprocess_funsd(args) -> int:
    """Raw FUNSD → GeoLayoutLM-preprocessed jsons (the reference's
    preprocess/funsd_el/preprocess.py as a CLI; output feeds
    `train geolayoutlm --train-data OUT/preprocessed`)."""
    from advancedliteratemachinery_tpu.data.funsd import preprocess_funsd

    written = preprocess_funsd(args.input_path, args.output_path,
                               vocab_file=args.vocab)
    print(json.dumps({k: len(v) for k, v in written.items()}))
    return 0


def cmd_export(args) -> int:
    """Export a jitted recognizer to a self-contained StableHLO artifact
    (the TPU-native deployment analog of LiteWeightOCR's MNN export)."""
    from advancedliteratemachinery_tpu.engine.export import export_recognizer

    path, nbytes = export_recognizer(
        args.model, args.variant, args.out, batch_size=args.batch_size,
        ckpt=args.ckpt, torch_ckpt=args.torch_ckpt)
    print(json.dumps({"artifact": path, "bytes": nbytes,
                      "model": args.model, "variant": args.variant,
                      "batch": args.batch_size}))
    return 0


def cmd_webrpg_cache(args) -> int:
    """Tokenized page jsonl → WebRPG embedding-cache records (reference
    create_webrpg_data_2.py; output feeds `train webrpg`)."""
    from advancedliteratemachinery_tpu.data.webrpg_prep import (
        build_webrpg_cache)

    model = variables = None
    if args.torch_ckpt:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from advancedliteratemachinery_tpu.engine.checkpoint import (
            TORCH_IMPORTERS, load_torch_state_dict)
        from advancedliteratemachinery_tpu.models.gem import (
            GEMConfig, GEMEncoder)

        cfg = GEMConfig(use_render_bbox=False)
        model = GEMEncoder(cfg)
        init_batch = {
            "input_ids": jnp.zeros((1, 4), jnp.int32),
            "attention_mask": jnp.ones((1, 4), jnp.int32),
            "xpath_tags_seq": jnp.zeros((1, 4, cfg.max_xpath_depth),
                                        jnp.int32),
            "xpath_subs_seq": jnp.zeros((1, 4, cfg.max_xpath_depth),
                                        jnp.int32),
        }
        variables = model.init(jax.random.PRNGKey(0), init_batch)
        variables = {"params": TORCH_IMPORTERS["gem_markuplm"](
            load_torch_state_dict(args.torch_ckpt),
            jax.tree.map(np.asarray, variables["params"]))}
    written = build_webrpg_cache(args.manifest, args.out_dir, model=model,
                                 variables=variables, max_seq=args.max_seq)
    print(json.dumps({"pages": len(written), "out_dir": args.out_dir}))
    return 0


def cmd_train(args) -> int:
    """Launch (or resume) a training run from LMDB sources.

    Reference surface: MGP-STR train_final_dist.py:31-238 (source mixing,
    iteration loop, valInterval validation + best tracking, periodic
    checkpoints, log_train.txt) and LISTER train_dist.py:28 — composed here
    from BalancedMixer → recipe → engine.fit.fit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.codecs.seq_codec import EosSeqCodec
    from advancedliteratemachinery_tpu.data.str_dataset import (
        AlignCollate,
        BalancedMixer,
        ListerCollate,
        LmdbStrDataset,
    )
    from advancedliteratemachinery_tpu.engine import batches as B
    from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
    from advancedliteratemachinery_tpu.engine.train import make_optimizer
    from advancedliteratemachinery_tpu.eval.str_eval import benchmark_all_eval
    from advancedliteratemachinery_tpu.parallel.mesh import (
        create_mesh, maybe_initialize_distributed)

    # multi-host pod slices: bootstrap the JAX runtime before any device
    # query (no-op on a single host; keyed on JAX_COORDINATOR_ADDRESS)
    maybe_initialize_distributed()
    mesh = create_mesh(data=-1, fsdp=args.fsdp, model=args.tp)
    L = args.batch_max_length
    batch_stats = None

    if args.model == "mgp_str":
        from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
        from advancedliteratemachinery_tpu.models.mgp_str import (
            MGPSTR, MGPSTRConfig)

        char_codec = CharCodec(batch_max_length=L)
        charset = args.charset or char_codec.charset
        bpe = wp = None
        try:
            from advancedliteratemachinery_tpu.codecs.subword import (
                BpeCodec, WordpieceCodec)

            bpe = BpeCodec.default(batch_max_length=L)
            wp = WordpieceCodec.default(batch_max_length=L)
        except FileNotFoundError:
            print("[train] GPT-2/BERT vocab assets missing "
                  "(scripts/fetch_vocabs.py) — bpe/wp heads train on "
                  "pad-only targets (char head unaffected)")
        cfg = MGPSTRConfig(variant=args.variant, batch_max_length=L)
        model = MGPSTR(cfg)
        params = model.init(jax.random.PRNGKey(args.seed),
                            jnp.zeros((1, 32, 128, 3)))["params"]
        if args.init_torch_ckpt:
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                import_mgp_str, load_torch_state_dict)

            params = import_mgp_str(load_torch_state_dict(args.init_torch_ckpt),
                                    jax.tree.map(np.asarray, params))
        datasets = [LmdbStrDataset(p, charset=charset, max_length=L)
                    for p in args.train_data]
        ratios = args.ratios or [1.0] * len(datasets)
        mixer = BalancedMixer(datasets, ratios, args.batch_size,
                              seed=args.seed)
        batch_iter = B.mgp_str_batches(mixer, char_codec, bpe, wp,
                                       AlignCollate(),
                                       augment=_train_augment(args))
        loss_fn, _ = B.mgp_str_recipe_u8(model)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps, grad_clip=5.0,
                            warmup_steps=args.warmup_steps)
        engine = MGPSTRInference(model, params, char_codec, bpe, wp)

        def eval_fn(state):
            engine.params = model.policy.cast_to_compute(state.params)
            return {"accuracy": benchmark_all_eval(
                engine.recognize, args.val_data, charset=charset,
                max_length=L, batch_size=args.batch_size)["total_accuracy"]}

    elif args.model == "lister":
        from advancedliteratemachinery_tpu.engine.infer import LISTERInference
        from advancedliteratemachinery_tpu.models.lister import (
            LISTER, LISTERConfig)

        cfg = LISTERConfig(variant=args.variant, max_ch=L + 1)
        codec = EosSeqCodec(max_ch=cfg.max_ch)
        charset = args.charset or codec.charset
        model = LISTER(cfg)
        params = model.init(jax.random.PRNGKey(args.seed),
                            jnp.zeros((1, 32, 128, 3)),
                            jnp.ones((1, 32, 128)), train=True)["params"]
        if args.init_torch_ckpt:
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                TORCH_IMPORTERS, load_torch_state_dict)

            params = TORCH_IMPORTERS["lister"](
                load_torch_state_dict(args.init_torch_ckpt),
                jax.tree.map(np.asarray, params))
        datasets = [LmdbStrDataset(p, charset=charset, max_length=L)
                    for p in args.train_data]
        ratios = args.ratios or [1.0] * len(datasets)
        mixer = BalancedMixer(datasets, ratios, args.batch_size,
                              seed=args.seed)
        batch_iter = B.lister_batches(mixer, codec, ListerCollate(),
                                      augment=_train_augment(args))
        loss_fn, _ = B.lister_recipe_u8(model, cfg)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=20.0, weight_decay=0.01,
                            warmup_steps=args.warmup_steps)
        engine = LISTERInference(model, params, codec)

        def eval_fn(state):
            engine.params = model.policy.cast_to_compute(state.params)
            return {"accuracy": benchmark_all_eval(
                engine.recognize, args.val_data, charset=charset,
                max_length=L, batch_size=args.batch_size)["total_accuracy"]}
    elif args.model == "omniparser":
        from advancedliteratemachinery_tpu.data.coco_spotting import (
            CocoSpottingDataset,
        )
        from advancedliteratemachinery_tpu.models.omniparser import (
            OmniParser, OmniParserConfig)

        vie = args.task == "vie"
        table = args.task == "table"
        vie_classes = ()
        n_categories = 0
        if vie:
            from advancedliteratemachinery_tpu.codecs.coords import (
                CORD_CLASSES, SROIE_CLASSES)
            vie_classes = (CORD_CLASSES if args.class_set == "cord"
                           else SROIE_CLASSES)
            n_categories = len(vie_classes)
        elif table:
            from advancedliteratemachinery_tpu.data.pubtabnet import (
                N_TABLE_CLASSES)
            n_categories = N_TABLE_CLASSES
        cfg = OmniParserConfig(swin_variant=args.variant,
                               vie_categories=n_categories)
        v = cfg.vocab()
        model = OmniParser(cfg)
        size = args.image_size
        seqs0 = {t: jnp.ones((1, 5), jnp.int32)
                 for t in ("pt", "poly", "rec")}
        params = model.init(jax.random.PRNGKey(args.seed),
                            jnp.zeros((1, size, size, 3)), seqs0)["params"]
        if args.init_torch_ckpt:
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                TORCH_IMPORTERS, load_torch_state_dict)

            params = TORCH_IMPORTERS["omniparser"](
                load_torch_state_dict(args.init_torch_ckpt),
                jax.tree.map(np.asarray, params))
        if vie:
            from advancedliteratemachinery_tpu.data.vie_spotting import (
                CordLikeVieDataset)

            ds = CordLikeVieDataset(
                args.train_data[0], args.img_root or ".", vie_classes,
                chars=v.chars, group_words=args.class_set == "cord")
            batch_iter = B.omniparser_vie_batches(
                ds, v, args.batch_size, image_hw=(size, size),
                poly_pts=cfg.poly_length // 2, rec_length=cfg.rec_length,
                seed=args.seed)
        elif table:
            from advancedliteratemachinery_tpu.data.pubtabnet import (
                PubTabNetDataset)

            ds = PubTabNetDataset(args.train_data[0], args.img_root or ".",
                                  chars=v.chars, rec_length=cfg.rec_length)
            # fit the triplet walk inside the decoder's position budget
            # (prompt 7 + sos + body <= max_position_embeddings), body a
            # multiple of 3 so truncation never splits a cell triplet
            body = min(384, cfg.max_position_embeddings - 8) // 3 * 3
            batch_iter = B.omniparser_table_batches(
                ds, v, args.batch_size, image_hw=(size, size),
                max_pt_body=body,
                poly_pts=cfg.poly_length // 2, rec_length=cfg.rec_length,
                seed=args.seed)
        else:
            ds = CocoSpottingDataset(args.img_root or ".",
                                     args.train_data[0],
                                     rec_length=cfg.rec_length)
            batch_iter = B.omniparser_batches(
                ds, v, args.batch_size, image_hw=(size, size),
                max_pts=cfg.max_instances, poly_pts=cfg.poly_length // 2,
                rec_length=cfg.rec_length, seed=args.seed)
        loss_fn, _ = B.omniparser_recipe_u8(model, v.padding_index)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=0.1, weight_decay=1e-4,
                            warmup_steps=args.warmup_steps)
        eval_fn = None
    elif args.model == "levocr":
        from advancedliteratemachinery_tpu.engine.infer import LevOCRInference
        from advancedliteratemachinery_tpu.models.levocr import (
            LevOCR, LevOCRConfig, LevtDictionary)

        cfg = LevOCRConfig()
        model = LevOCR(cfg)
        d = LevtDictionary(max_len=cfg.max_len)
        charset = args.charset or "".join(d.itos[4:])
        tok = jnp.asarray(d.encode([""]))
        variables = model.init(jax.random.PRNGKey(args.seed),
                               jnp.zeros((1, 32, 128, 3)), tok, tok, tok)
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        if args.init_torch_ckpt:
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                TORCH_IMPORTERS, load_torch_state_dict)

            imported = TORCH_IMPORTERS["levocr"](
                load_torch_state_dict(args.init_torch_ckpt),
                jax.tree.map(np.asarray, dict(variables)))
            params, batch_stats = imported["params"], imported["batch_stats"]
        if args.task == "language":
            # text-only pretraining of the LevT branch
            # (train_language_dist.py): corpus lines + spelling mutation
            from advancedliteratemachinery_tpu.data.text_corpus import (
                TextCorpusDataset)

            corpus = TextCorpusDataset(args.train_data[0], max_length=L)
            batch_iter = B.levocr_text_batches(corpus, d, args.batch_size,
                                               seed=args.seed)
            loss_fn, _ = B.levocr_text_recipe(model, cfg)
            batch_stats = None
        else:
            datasets = [LmdbStrDataset(p, charset=charset, max_length=L)
                        for p in args.train_data]
            ratios = args.ratios or [1.0] * len(datasets)
            mixer = BalancedMixer(datasets, ratios, args.batch_size,
                                  seed=args.seed)
            batch_iter = B.levocr_batches(
                mixer, d, vision_len=cfg.vision.max_length,
                vision_classes=cfg.vision.num_classes, seed=args.seed)
            loss_fn, _ = B.levocr_recipe_u8(model, cfg)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=5.0, warmup_steps=args.warmup_steps)
        if args.task == "language":
            eval_fn = None          # no vision path to benchmark
        else:
            engine = LevOCRInference(model, {"params": params,
                                             "batch_stats": batch_stats})

            def eval_fn(state):
                v = {"params": state.params,
                     "batch_stats": state.batch_stats}
                return {"accuracy": benchmark_all_eval(
                    lambda imgs: engine.recognize(imgs, variables=v),
                    args.val_data, charset=charset, max_length=L,
                    batch_size=args.batch_size)["total_accuracy"]}

    elif args.model == "geolayoutlm":
        from advancedliteratemachinery_tpu.engine.recipes import (
            geolayoutlm_recipe,
        )
        from advancedliteratemachinery_tpu.models.geolayoutlm import (
            GeoLayoutLM, GeoLayoutLMConfig)

        cfg = GeoLayoutLMConfig()
        model = GeoLayoutLM(cfg)
        ds = B.VIEPreprocessedDataset(args.train_data[0])
        batch_iter = B.vie_batches(ds, args.batch_size,
                                   image_size=cfg.image_size,
                                   seed=args.seed)
        sample = jax.tree.map(jnp.asarray, next(batch_iter))
        params = model.init(jax.random.PRNGKey(args.seed), sample)["params"]
        if args.init_torch_ckpt:
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                TORCH_IMPORTERS, load_torch_state_dict)

            params = TORCH_IMPORTERS["geolayoutlm_vie"](
                load_torch_state_dict(args.init_torch_ckpt),
                jax.tree.map(np.asarray, params))
        loss_fn, _ = geolayoutlm_recipe(model)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=1.0, warmup_steps=args.warmup_steps)
        eval_fn = None
    elif args.model == "vlpt":
        from advancedliteratemachinery_tpu.data.arrow_dataset import (
            MLMSpec, SynthTextArrowDataset)
        from advancedliteratemachinery_tpu.engine.recipes import vlpt_recipe
        from advancedliteratemachinery_tpu.models.vlpt import (
            VLPT, VLPTConfig)

        cfg = VLPTConfig()
        model = VLPT(cfg)
        try:
            from advancedliteratemachinery_tpu.codecs.subword import (
                WordpieceCodec)

            wp = WordpieceCodec.default()
            spec = MLMSpec(
                encode=wp.encode_text,
                is_subword=lambda i: wp.inv.get(i, "").startswith("##"))
        except FileNotFoundError:
            print("[train] BERT vocab assets missing "
                  "(scripts/fetch_vocabs.py) — falling back to a "
                  "byte-level tokenizer for MLM pretraining")
            spec = MLMSpec(
                encode=lambda t: [200 + b for b in t.encode("utf-8")[:28]])
        ds = SynthTextArrowDataset(args.train_data[0], spec,
                                   image_size=cfg.image_size,
                                   max_text_len=cfg.max_text_len)
        batch_iter = B.vlpt_batches(ds, args.batch_size, seed=args.seed)
        sample = jax.tree.map(jnp.asarray, next(batch_iter))
        variables = model.init(jax.random.PRNGKey(args.seed), sample,
                               train=True)
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        loss_fn, _ = vlpt_recipe(model)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=1.0, warmup_steps=args.warmup_steps)
        eval_fn = None
    elif args.model == "webrpg":
        from advancedliteratemachinery_tpu.engine.recipes import webrpg_recipe
        from advancedliteratemachinery_tpu.models.webrpg import (
            WebRPGConfig, WebRPGModel)

        cfg = WebRPGConfig()
        model = WebRPGModel(cfg)
        ds = B.WebRPGCacheDataset(args.train_data[0])
        batch_iter = B.webrpg_batches(ds, args.batch_size, seed=args.seed)
        sample = jax.tree.map(jnp.asarray, next(batch_iter))
        params = model.init(jax.random.PRNGKey(args.seed), sample,
                            jax.random.PRNGKey(1))["params"]
        if args.init_torch_ckpt:   # pretrained frozen VAE (trainer_ar.py)
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                import_webrpg_vae, load_torch_state_dict)

            vae_vars = import_webrpg_vae(
                load_torch_state_dict(args.init_torch_ckpt),
                {"params": jax.tree.map(np.asarray, params["vae"])})
            params = dict(params)
            params["vae"] = vae_vars["params"]
        loss_fn, tx = webrpg_recipe(model, cfg)
        eval_fn = None
    elif args.model == "lvtr":
        from advancedliteratemachinery_tpu.engine.recipes import lvtr_recipe
        from advancedliteratemachinery_tpu.models.lvtr import (
            ExCTC, LVTRConfig, LVTRUnet)

        cfg = LVTRConfig()
        model = LVTRUnet(cfg)
        recognizer = ExCTC()
        ds = B.LVTRManifestDataset(args.train_data[0])
        batch_iter = B.lvtr_batches(ds, args.batch_size,
                                    max_text_len=cfg.max_text_len,
                                    seed=args.seed)
        sample = next(batch_iter)
        conds = {k: jnp.asarray(sample[k]) for k in
                 ("images_style", "images_removal", "images_render",
                  "line_poly_mask", "word_poly_mask", "text_ids")}
        params = model.init(jax.random.PRNGKey(args.seed),
                            jnp.asarray(sample["x0"]),
                            jnp.zeros((args.batch_size,)), conds)["params"]
        rec_params = recognizer.init(
            jax.random.PRNGKey(args.seed + 1),
            jnp.asarray(sample["x0"]))["params"]
        if args.init_torch_ckpt:   # frozen recognizer.pth (train_lvtr.py)
            print("[train] note: --init-torch-ckpt for lvtr expects the "
                  "released decoder; use import-ckpt lvtr for the Unet")
        loss_fn, _ = lvtr_recipe(model, recognizer,
                                 jax.tree.map(jnp.asarray, rec_params), cfg)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=1.0, weight_decay=0.01)
        eval_fn = None
    elif args.model == "trcg":
        from advancedliteratemachinery_tpu.engine.recipes import trcg_recipe
        from advancedliteratemachinery_tpu.models.trcg import TRCG, TRCGConfig

        cfg = TRCGConfig(lora_rank=args.lora_rank)
        model = TRCG(cfg)
        hw = cfg.clip.image_size if cfg.use_clip_tower else \
            cfg.vision.img_size[0]
        n_img = ((hw // (cfg.clip.patch_size if cfg.use_clip_tower
                         else cfg.vision.patch_size)) ** 2)
        ds = B.TRCGManifestDataset(args.train_data[0])
        batch_iter = B.trcg_batches(ds, args.batch_size, image_hw=(hw, hw),
                                    max_len=args.batch_max_length,
                                    seed=args.seed)
        sample = next(batch_iter)
        params = model.init(jax.random.PRNGKey(args.seed),
                            jnp.asarray(sample["images"]),
                            jnp.asarray(sample["input_ids"]))["params"]
        if args.init_torch_ckpt:
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                TORCH_IMPORTERS, load_torch_state_dict)

            params = TORCH_IMPORTERS["trcg"](
                load_torch_state_dict(args.init_torch_ckpt),
                jax.tree.map(np.asarray, params),
                merge_lora=False, n_heads=cfg.heads)
        loss_fn, tx = trcg_recipe(model, n_img)   # LoRA optimizer freezes base
        eval_fn = None
    elif args.model == "vgt":
        from advancedliteratemachinery_tpu.engine.recipes import vgt_recipe
        from advancedliteratemachinery_tpu.models.rcnn import (
            CascadeConfig, VGTCascadeDetector)
        from advancedliteratemachinery_tpu.models.vgt import VGTConfig

        bcfg = VGTConfig()
        detector = VGTCascadeDetector(
            backbone_config=bcfg,
            cascade_config=CascadeConfig(num_classes=args.num_classes))
        try:
            from advancedliteratemachinery_tpu.codecs.subword import (
                WordpieceCodec)

            tok = WordpieceCodec.default().encode_text
            tokenize_fn = lambda texts: [tok(t) for t in texts]  # noqa: E731
        except FileNotFoundError:
            tokenize_fn = lambda texts: [  # noqa: E731
                [200 + b for b in t.encode("utf-8")[:8]] for t in texts]
        hw = bcfg.img_size
        batch_iter = B.vgt_batches(args.train_data[0], args.img_root or ".",
                                   tokenize_fn, image_hw=hw,
                                   seed=args.seed)
        sample = next(batch_iter)
        variables = detector.init(
            jax.random.PRNGKey(args.seed), jnp.asarray(sample["images"]),
            jnp.asarray(sample["grid_ids"]))
        if args.init_torch_ckpt:
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                TORCH_IMPORTERS, load_torch_state_dict)

            variables = TORCH_IMPORTERS["vgt_cascade"](
                load_torch_state_dict(args.init_torch_ckpt),
                jax.tree.map(np.asarray, dict(variables)))
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        loss_fn, _ = vgt_recipe(detector)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=1.0, weight_decay=0.05,
                            warmup_steps=args.warmup_steps)
        eval_fn = None
    elif args.model == "gem":
        from advancedliteratemachinery_tpu.engine.recipes import (
            gem_swde_recipe, gem_websrc_recipe,
        )
        from advancedliteratemachinery_tpu.models.gem import (
            GEMConfig, GEMForSWDE, GEMForWebSRC)

        websrc = args.task == "websrc"
        if websrc:
            cfg = GEMConfig(use_render_bbox=False)
            model = GEMForWebSRC(cfg)
            ds = B.GEMSwdeDataset(args.train_data[0])
            batch_iter = B.gem_websrc_batches(
                ds, args.batch_size, max_seq=min(384, cfg.max_position),
                xpath_depth=cfg.max_xpath_depth, seed=args.seed)
        else:
            cfg = GEMConfig()
            model = GEMForSWDE(cfg)
            ds = B.GEMSwdeDataset(args.train_data[0])
            batch_iter = B.gem_swde_batches(
                ds, args.batch_size, max_seq=min(384, cfg.max_position),
                xpath_depth=cfg.max_xpath_depth,
                use_render_bbox=cfg.use_render_bbox, seed=args.seed)
        sample = jax.tree.map(jnp.asarray, next(batch_iter))
        params = model.init(jax.random.PRNGKey(args.seed), sample)["params"]
        if args.init_torch_ckpt:   # pretrained GEM/MarkupLM encoder
            from advancedliteratemachinery_tpu.engine.checkpoint import (
                TORCH_IMPORTERS, load_torch_state_dict)

            params = dict(params)
            params["gem"] = TORCH_IMPORTERS["gem_markuplm"](
                load_torch_state_dict(args.init_torch_ckpt),
                jax.tree.map(np.asarray, params["gem"]))
        loss_fn, _ = (gem_websrc_recipe(model) if websrc
                      else gem_swde_recipe(model))
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=1.0, warmup_steps=args.warmup_steps)
        eval_fn = None
    elif args.model == "db":
        from advancedliteratemachinery_tpu.data.coco_spotting import (
            CocoSpottingDataset,
        )
        from advancedliteratemachinery_tpu.models.db import DBConfig, DBDetector

        model = DBDetector(DBConfig())
        size = args.image_size
        variables = model.init(jax.random.PRNGKey(args.seed),
                               jnp.zeros((1, size, size, 3)), train=True)
        params, batch_stats = variables["params"], variables["batch_stats"]
        ds = CocoSpottingDataset(args.img_root or ".", args.train_data[0])
        batch_iter = B.db_batches(ds, args.batch_size,
                                  image_hw=(size, size), seed=args.seed)
        loss_fn, _ = B.db_recipe_u8(model)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=5.0, warmup_steps=args.warmup_steps)
        eval_fn = None
    elif args.model == "lore":
        from advancedliteratemachinery_tpu.models.lore import LORE

        model = LORE()
        size = args.image_size
        variables = model.init_full(jax.random.PRNGKey(args.seed),
                                    image_shape=(size, size))
        params, batch_stats = variables["params"], variables["batch_stats"]
        ds = B.TableDataset(args.img_root or ".", args.train_data[0])
        batch_iter = B.lore_batches(ds, args.batch_size,
                                    image_hw=(size, size), seed=args.seed)
        loss_fn, _ = B.lore_recipe_u8(model)
        tx = make_optimizer(lr=args.lr, total_steps=args.steps,
                            grad_clip=5.0, warmup_steps=args.warmup_steps)
        eval_fn = None
    else:
        raise SystemExit(f"unknown trainable model {args.model!r}")

    if args.grad_accum > 1:
        from advancedliteratemachinery_tpu.engine.train_extras import (
            with_accumulation,
        )

        tx = with_accumulation(tx, args.grad_accum)

    fit_cfg = FitConfig(
        total_steps=args.steps, log_interval=args.log_interval,
        val_interval=args.val_interval if args.val_data else 0,
        save_interval=args.save_interval, ckpt_dir=args.ckpt_dir,
        resume=args.resume, seed=args.seed, profile_dir=args.profile,
        keep_last=args.keep_last, handle_sigterm=not args.no_sigterm)
    result = fit(loss_fn, tx, params, batch_iter, fit_cfg, mesh=mesh,
                 batch_stats=batch_stats,
                 eval_fn=eval_fn if args.val_data else None)
    print(json.dumps({
        "model": args.model, "steps_run": result.steps_run,
        "best": result.best_metric,
        "final_val": result.history[-1] if result.history else None,
        "ckpt_dir": args.ckpt_dir,
    }))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="alm-tpu",
                                     description=__doc__.split("\n")[0])
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("models", help="list registered components")
    p.add_argument("--cost", metavar="MODEL",
                   help="also print params + forward GFLOPs for a "
                        "recognition model (get_flops / model_cost.py)")
    p.add_argument("--variant", default="tiny",
                   choices=["tiny", "small", "base", "large"])

    for name, help_ in (("recognize",
                         "recognize word crops (MGP-STR/LISTER/LevOCR)"),):
        p = sub.add_parser(name, help=help_)
        p.add_argument("images", nargs="+")
        p.add_argument("--model", default="mgp_str",
                       choices=["mgp_str", "lister", "levocr"])
        p.add_argument("--variant", default="tiny",
                       choices=["tiny", "small", "base", "large"])
        p.add_argument("--ckpt")
        p.add_argument("--torch-ckpt")

    for name, help_ in (("read", "detect + recognize full image"),
                        ("structurize", "document structurization → JSON"),
                        ("table", "table parsing → cells + HTML")):
        p = sub.add_parser(name, help=help_)
        p.add_argument("image")
        p.add_argument("--model", default="mgp_str",
                       choices=["mgp_str", "lister", "levocr"])
        p.add_argument("--variant", default="tiny",
                       choices=["tiny", "small", "base", "large"])
        p.add_argument("--ckpt")
        p.add_argument("--torch-ckpt")
        p.add_argument("--det-thresh", type=float, default=0.3)
        p.add_argument("--visualize", metavar="OUT.png",
                       help="write an overlay image (reference DocXChain "
                            "utilities/visualization.py)")
        if name == "structurize":
            p.add_argument("--formula-onnx", metavar="DIR",
                           help="LaTeX-OCR-format ONNX model dir "
                                "(encoder/decoder/tokenizer[/resizer]) "
                                "for formula regions — the reference's "
                                "RapidLatexOCR backend; needs "
                                "onnxruntime")

    p = sub.add_parser("vie",
                       help="key-information extraction (OmniParser VIE) "
                            "→ entity JSON")
    p.add_argument("image")
    p.add_argument("--variant", default="base",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--class-set", default="cord",
                   choices=["cord", "sroie"])
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--ckpt")
    p.add_argument("--torch-ckpt")

    p = sub.add_parser("table-html",
                       help="table recognition (OmniParser TR) → "
                            "PubTabNet-dialect HTML")
    p.add_argument("image")
    p.add_argument("--variant", default="base",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--ckpt")
    p.add_argument("--torch-ckpt")

    p = sub.add_parser("table-eval",
                       help="TEDS/S-TEDS over a PubTabNet-format jsonl "
                            "(OmniParser TR README protocol)")
    p.add_argument("data", help="PubTabNet jsonl annotations")
    p.add_argument("--img-root", help="table image directory")
    p.add_argument("--split", help="filter on the jsonl split field")
    p.add_argument("--limit", type=int, help="cap evaluated samples")
    p.add_argument("--per-sample", action="store_true",
                   help="include per-table scores in the JSON")
    p.add_argument("--variant", default="base",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--ckpt")
    p.add_argument("--torch-ckpt")

    p = sub.add_parser("convert",
                       help="whole image/PDF document → per-page JSON")
    p.add_argument("document")
    p.add_argument("--variant", default="tiny",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--ckpt")
    p.add_argument("--torch-ckpt")
    p.add_argument("--det-thresh", type=float, default=0.3)
    p.add_argument("--dpi", type=int, default=150)

    p = sub.add_parser("augment-preview",
                       help="apply every augmentation op to an image")
    p.add_argument("image")
    p.add_argument("--out-dir", default="augment_preview")
    p.add_argument("--mag", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)

    sub.add_parser("bench", help="run the repo benchmark")

    p = sub.add_parser("train", help="launch/resume a training run")
    p.add_argument("model", choices=["mgp_str", "lister", "levocr",
                                     "omniparser", "db", "lore",
                                     "geolayoutlm", "vlpt", "webrpg",
                                     "lvtr", "trcg", "vgt", "gem"])
    p.add_argument("--train-data", nargs="+", required=True,
                   help="LMDB source dirs (mixed per --ratios); for "
                        "omniparser: a COCO spotting annotation json")
    p.add_argument("--img-root", help="image folder (omniparser)")
    p.add_argument("--image-size", type=int, default=640,
                   help="train page size (omniparser)")
    p.add_argument("--ratios", nargs="+", type=float,
                   help="per-source batch ratios (default: equal)")
    p.add_argument("--val-data", nargs="+", default=[],
                   help="LMDB eval dirs (benchmark_all_eval protocol)")
    p.add_argument("--variant", default="base",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--batch-max-length", type=int, default=25)
    p.add_argument("--charset", help="override the codec charset")
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--val-interval", type=int, default=2000)
    p.add_argument("--save-interval", type=int, default=5000)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--keep-last", type=int, default=3,
                   help="step_N checkpoints retained (0 = all)")
    p.add_argument("--no-sigterm", action="store_true",
                   help="disable the save-and-stop SIGTERM preemption "
                        "hook (e.g. under debuggers that send SIGTERM)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fsdp", type=int, default=1, help="fsdp mesh axis")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel axis")
    p.add_argument("--init-torch-ckpt",
                   help="initialize from a reference torch checkpoint")
    p.add_argument("--profile", metavar="DIR",
                   help="capture a jax.profiler trace of a few train steps")
    p.add_argument("--lora-rank", type=int, default=128,
                   help="LoRA rank for trcg finetuning (reference lora_r)")
    p.add_argument("--num-classes", type=int, default=5,
                   help="detection categories (vgt; PubLayNet=5)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="gradient accumulation steps (optax.MultiSteps)")
    p.add_argument("--task", default="spotting",
                   choices=["spotting", "vie", "table", "language", "websrc"],
                   help="omniparser objective: text spotting (COCO json) "
                        "or KIE over CORD-v2-style page jsons; for "
                        "levocr, 'language' = text-only LevT pretraining "
                        "over a line corpus (train_language_dist.py); for "
                        "gem, 'websrc' = span-QA fine-tune instead of "
                        "SWDE node classification")
    p.add_argument("--class-set", default="cord",
                   choices=["cord", "sroie"],
                   help="VIE label set + grouping (cord: entity groups; "
                        "sroie: per-word class triplets)")
    p.add_argument("--rand-aug", action="store_true",
                   help="random augmentation (reference --isrand_aug; "
                        "mgp_str/lister)")
    p.add_argument("--augs-num", type=int, default=3,
                   help="augmentation groups per image (reference augs_num)")
    p.add_argument("--intact-prob", type=float, default=0.5,
                   help="probability of skipping augmentation")

    p = sub.add_parser("eval",
                       help="STR benchmark over LMDB eval sets "
                            "(benchmark_all_eval protocol)")
    p.add_argument("--data", nargs="+", required=True,
                   help="LMDB eval dirs (IIIT5k, SVT, ...)")
    p.add_argument("--model", default="mgp_str",
                   choices=["mgp_str", "lister", "levocr"])
    p.add_argument("--variant", default="base",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--ckpt")
    p.add_argument("--torch-ckpt")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--batch-max-length", type=int, default=25)
    p.add_argument("--charset")
    p.add_argument("--config-json",
                   help="model-config field overrides (JSON dict; used "
                        "by the docs/PARITY.md rehearsals to run the "
                        "released command line at fixture dims)")

    p = sub.add_parser("eval-det",
                       help="COCO-protocol detection mAP from a "
                            "detections JSON vs ground truth")
    p.add_argument("detections", help="[{image_id, category_id, bbox "
                                      "xywh, score}] or COCO results file")
    p.add_argument("ground_truth", help="[{image_id, category_id, bbox}] "
                                        "or a full COCO annotation file")

    p = sub.add_parser("layout",
                       help="VGT layout detection: page images (+ "
                            "pdf-grid .npz) → detections JSON for "
                            "eval-det")
    p.add_argument("images", nargs="+")
    p.add_argument("--grid-dir", help="dir of pdf-grid .npz word grids "
                                      "(matched by image stem)")
    p.add_argument("--torch-ckpt", help="released VGT detectron2 .pth")
    p.add_argument("--ckpt", help="Orbax checkpoint dir")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--config-json", help="VGTConfig field overrides")
    p.add_argument("--cascade-json", help="CascadeConfig field overrides")
    p.add_argument("--out", help="write detections JSON here")

    p = sub.add_parser("eval-funsd",
                       help="GeoLayoutLM FUNSD SER/RE F1 over "
                            "preprocess-funsd output")
    p.add_argument("data", help="preprocessed page-json dir")
    p.add_argument("--torch-ckpt")
    p.add_argument("--ckpt")
    p.add_argument("--config-json", help="GeoLayoutLMConfig overrides")
    p.add_argument("--class-names", default="HEADER,QUESTION,ANSWER")
    p.add_argument("--max-seq", type=int, default=512)
    p.add_argument("--max-blocks", type=int, default=96)
    p.add_argument("--cls-id", type=int, default=101)

    p = sub.add_parser("ccocr-eval",
                       help="CC-OCR benchmark harness over a predictions "
                            "directory")
    p.add_argument("index", help="index JSON ([{dataset, group, ...}])")
    p.add_argument("pred_dir", help="per-dataset response dirs/json files")
    p.add_argument("gt_dir", help="per-dataset ground-truth dirs/json files")
    p.add_argument("--weighted", action="store_true",
                   help="sample-weighted overall score")

    p = sub.add_parser("ccocr-collect",
                       help="run a model over a CC-OCR benchmark tree and "
                            "write the per-image prediction dirs the "
                            "harness consumes (reference example.py)")
    p.add_argument("index", help="index JSON ([{dataset, group, base_dir, "
                                 "release}])")
    p.add_argument("output_dir")
    p.add_argument("--model", default="pipeline",
                   help="'pipeline' (this repo's general-text-reading "
                        "stack), 'dummy' (empty responses; plumbing "
                        "check), or 'import:module:attr' for any "
                        "callable(image_path, question) -> text (the "
                        "reference's dashscope/OpenAI callers are one "
                        "import: away)")
    p.add_argument("--model-name", default=None,
                   help="output subdirectory name (default: --model)")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--no-resume", action="store_true",
                   help="recompute responses that already exist")
    p.add_argument("--base-dir", default=None,
                   help="benchmark root the index's base_dirs are relative "
                        "to (default: the index file's grandparent, as in "
                        "the reference)")
    p.add_argument("--ckpt", default=None,
                   help="Orbax checkpoint for --model pipeline")

    p = sub.add_parser("pdf-grid",
                       help="PDF text layer -> per-page VGT grid .npz "
                            "(create_grid_input.py equivalent, "
                            "dependency-free PDF parsing)")
    p.add_argument("pdf")
    p.add_argument("output_dir")
    p.add_argument("--vocab", default=None,
                   help="BERT vocab.txt for WordPiece ids (default: "
                        "stable byte-level fallback ids)")

    p = sub.add_parser("preprocess-funsd",
                       help="raw FUNSD tree -> GeoLayoutLM-preprocessed "
                            "page jsons (preprocess/funsd_el/preprocess.py)")
    p.add_argument("input_path",
                   help="FUNSD root (training_data/ + testing_data/)")
    p.add_argument("output_path")
    p.add_argument("--vocab", help="BERT vocab.txt (default: package asset)")

    p = sub.add_parser("export",
                       help="serialize a recognizer forward (weights "
                            "embedded) to a portable StableHLO artifact "
                            "— the MNN-export analog")
    p.add_argument("out", help="output artifact path")
    p.add_argument("--model", default="mgp_str",
                   choices=["mgp_str", "lister"])
    p.add_argument("--variant", default="base",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--ckpt")
    p.add_argument("--torch-ckpt")

    p = sub.add_parser("webrpg-cache",
                       help="tokenized page jsonl -> WebRPG embedding "
                            "cache .npz records (create_webrpg_data_2.py)")
    p.add_argument("manifest")
    p.add_argument("out_dir")
    p.add_argument("--torch-ckpt",
                   help="released MarkupLM checkpoint for the encoder")
    p.add_argument("--max-seq", type=int, default=128)

    p = sub.add_parser("create-lmdb",
                       help="build an STR LMDB from a `path\\tlabel` gt "
                            "file (create_lmdb_dataset.py)")
    p.add_argument("gt_file")
    p.add_argument("out_dir")
    p.add_argument("--root", default="", help="image path prefix")
    p.add_argument("--no-check", action="store_true",
                   help="skip image validity checks")

    p = sub.add_parser("serve",
                       help="HTTP recognition service (continuous batching)")
    p.add_argument("--model", default="mgp_str",
                   choices=["mgp_str", "lister", "levocr"])
    p.add_argument("--variant", default="tiny",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--ckpt")
    p.add_argument("--torch-ckpt")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--with-detector", action="store_true",
                   help="enable POST /v1/read (DB detect + recognize)")
    p.add_argument("--det-thresh", type=float, default=0.3)

    p = sub.add_parser("import-ckpt",
                       help="convert a reference torch .pth → Orbax checkpoint")
    p.add_argument("family", choices=["mgp_str", "lister", "levocr", "lore",
                                      "geolayoutlm_backbone",
                                      "geolayoutlm_vie", "omniparser",
                                      "vgt_cascade", "docxlayout",
                                      "gem_markuplm", "vlpt"])
    p.add_argument("torch_ckpt")
    p.add_argument("out")
    p.add_argument("--variant", default="base")

    args = parser.parse_args(argv)
    return {"models": cmd_models, "recognize": cmd_recognize, "read": cmd_read,
            "structurize": cmd_structurize, "table": cmd_table,
            "table-html": cmd_table_html, "table-eval": cmd_table_eval,
            "vie": cmd_vie,
            "convert": cmd_convert, "bench": cmd_bench, "train": cmd_train,
            "create-lmdb": cmd_create_lmdb, "eval": cmd_eval,
            "preprocess-funsd": cmd_preprocess_funsd,
            "webrpg-cache": cmd_webrpg_cache, "export": cmd_export,
            "ccocr-eval": cmd_ccocr_eval,
            "ccocr-collect": cmd_ccocr_collect, "eval-det": cmd_eval_det,
            "layout": cmd_layout, "eval-funsd": cmd_eval_funsd,
            "pdf-grid": cmd_pdf_grid,
            "augment-preview": cmd_augment_preview,
            "serve": cmd_serve,
            "import-ckpt": cmd_import_ckpt}[args.command](args)


if __name__ == "__main__":
    sys.exit(main())

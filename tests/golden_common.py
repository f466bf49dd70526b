"""Shared builders for the committed golden parity fixtures.

Each family builder produces (a) a realistic torch checkpoint artifact and
(b) input arrays + expected outputs, which `scripts/make_golden_fixtures.py`
writes under tests/golden/ and `tests/test_golden.py` replays through the
REAL user path: load_torch_state_dict → importer → flax inference.

Expected outputs come from the torch mirrors of the reference math
(the same mirrors the per-family import tests verify numerically), frozen
at generation time — so any later drift in an importer, a model, or the
checkpoint loader fails against a *committed* artifact instead of a
mirror rebuilt inside the failing test process. LISTER has no full-model
torch mirror (its encoder/decoder pieces are parity-proven separately in
test_lister_import/test_focalnet_import), so its expected outputs are the
imported flax model's — a regression pin, marked `expected_source="flax"`.

Note on scope: the build image has zero egress, so fixtures derive from
the in-repo mirrors at tiny dims, not from the released checkpoints
(reference eval protocol OCR/MGP-STR/test_final.py:29). Released-weight
golden numbers need a one-time generation pass wherever the .pth files
are available — the replay harness here is exactly what would consume
them.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FAMILIES = ("mgp_str", "lister", "levocr", "lore", "omniparser",
            "webrpg_vae", "gem_markuplm", "docxlayout",
            "vlpt", "vgt", "lvtr", "trcg", "fid_web", "geolayoutlm")
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")


def _j(params_tree):
    import jax

    return jax.tree.map(np.asarray, params_tree)


# ---------------- per-family: build flax model + run imported ----------------


def run_mgp_str(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_checkpoint_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_mgp_str
    from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig
    from advancedliteratemachinery_tpu.models.vit import ViTConfig

    cfg = MGPSTRConfig(variant="tiny", batch_max_length=M.T - 2,
                       bpe_vocab_size=64, wp_vocab_size=64,
                       vit=ViTConfig(embed_dim=M.D, depth=M.DEPTH,
                                     num_heads=M.HEADS))
    model = MGPSTR(cfg, policy=FP32_POLICY)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3)))["params"]
    params = import_mgp_str(sd, _j(params))
    out = model.apply({"params": params}, jnp.asarray(inputs["image"]))
    return {h: np.asarray(out[h]) for h in ("char", "bpe", "wp")}


def run_lister(sd, inputs):
    import jax
    import jax.numpy as jnp

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_lister
    from advancedliteratemachinery_tpu.models.focalnet import (
        FOCALNET_VARIANTS, FocalNetConfig)
    from advancedliteratemachinery_tpu.models.lister import LISTER, LISTERConfig

    FOCALNET_VARIANTS.setdefault("import_tiny", FocalNetConfig(
        embed_dim=8, depths=(1, 1, 1, 1), drop_path_rate=0.0,
        layerscale_value=1e-2))
    cfg = LISTERConfig(variant="import_tiny", max_ch=6, iters=1,
                       nhead=2, window_size=5, drop_path_rate=0.0)
    model = LISTER(cfg, policy=FP32_POLICY)
    x = jnp.asarray(inputs["image"])
    mask = jnp.asarray(inputs["mask"])
    params = model.init(jax.random.PRNGKey(0), x, mask)["params"]
    params = import_lister(sd, _j(params))
    res = model.apply({"params": params}, x, mask)
    return {"logits": np.asarray(res[-1]["logits"])}


def run_levocr(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_levocr_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_levocr
    from advancedliteratemachinery_tpu.models.abinet import ABINetVisionConfig
    from advancedliteratemachinery_tpu.models.levocr import LevOCR, LevOCRConfig

    cfg = LevOCRConfig(
        max_len=M.MAXLEN, d_model=M.DL, heads=2, ffn=64, layers=1,
        vision=ABINetVisionConfig(max_length=6, num_classes=37,
                                  d_model=M.DV, ffn=256))
    model = LevOCR(cfg, policy=FP32_POLICY)
    img = jnp.asarray(inputs["image"])
    noised = jnp.asarray(inputs["noised"])
    masked = jnp.asarray(inputs["masked"])
    variables = model.init(jax.random.PRNGKey(0), img, noised, masked,
                           train=False)
    variables = import_levocr(sd, dict(variables))
    out = model.apply(variables, img, noised, masked, train=False)
    return {k: np.asarray(out[k]) for k in
            ("vision_logits", "mask_ins_logits", "word_ins_logits",
             "word_del_logits")}


def run_lore(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_dla_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_dla
    from advancedliteratemachinery_tpu.models.dla import (
        DLAConfig, DLASeg, DLASegConfig)

    cfg = DLASegConfig(dla=DLAConfig(levels=M.LEVELS, channels=M.CH),
                       head_conv=M.HEAD_CONV, heads=M.HEADS)
    model = DLASeg(cfg, policy=FP32_POLICY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    variables = import_dla(sd, dict(variables))
    out = model.apply(variables, jnp.asarray(inputs["image"]), train=False)
    return {h: np.asarray(out[h]) for h, _ in M.HEADS}


def run_omniparser(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_omniparser_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_omniparser
    from advancedliteratemachinery_tpu.models.omniparser import (
        OmniParser, OmniParserConfig)
    from advancedliteratemachinery_tpu.models.swin import SwinConfig

    cfg = OmniParserConfig(
        d_model=M.DM, nhead=M.NHEAD, dec_layers=M.LAYERS,
        dim_feedforward=M.FFN, max_position_embeddings=M.MAXPOS,
        num_bins=M.NBINS, dropout=0.0, drop_path_rate=0.0,
        pt_seq_length=8, poly_length=4, rec_length=4, max_instances=4,
        swin=SwinConfig(embed_dim=M.D0, depths=M.DEPTHS, num_heads=M.HEADS4,
                        window_size=M.WIN, drop_path_rate=0.0))
    model = OmniParser(cfg, policy=FP32_POLICY)
    seqs0 = {t: jnp.ones((1, 5), jnp.int32) for t in ("pt", "poly", "rec")}
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                        seqs0)["params"]
    params = import_omniparser(sd, _j(params))
    seqs = {t: jnp.asarray(inputs[f"seq_{t}"]) for t in ("pt", "poly", "rec")}
    out = model.apply({"params": params}, jnp.asarray(inputs["image"]), seqs)
    return {t: np.asarray(out[t]) for t in ("pt", "poly", "rec")}


def run_webrpg_vae(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_webrpg_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        import_webrpg_vae)
    from advancedliteratemachinery_tpu.models.webrpg import (
        ElementVAE, WebRPGConfig)

    cfg = WebRPGConfig(param_vocab=M.VOCAB, latent_dim=M.LATENT,
                       parameters_len=M.T, vae_hidden=M.HIDDEN)
    vae = ElementVAE(cfg, policy=FP32_POLICY)
    ids = jnp.asarray(inputs["ids"])
    variables = vae.init(jax.random.PRNGKey(0), ids, jax.random.PRNGKey(1))
    variables = import_webrpg_vae(sd, _j(variables))
    mu, logvar = vae.apply(variables, ids, method=ElementVAE.encode)
    dec = vae.apply(variables, jnp.asarray(inputs["z"]),
                    method=ElementVAE.decode)
    return {"mu": np.asarray(mu), "logvar": np.asarray(logvar),
            "dec": np.asarray(dec)}


def run_gem_markuplm(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_gem_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        import_gem_markuplm)
    from advancedliteratemachinery_tpu.models.gem import GEMConfig, GEMEncoder

    cfg = GEMConfig(vocab_size=M.VOCAB, hidden_size=M.H, num_layers=M.LAYERS,
                    heads=M.HEADS, max_position=M.POS,
                    max_xpath_depth=M.DEPTH, xpath_tag_vocab=M.TAGV,
                    xpath_subs_vocab=M.SUBV, xpath_unit_hidden=M.UNIT,
                    use_render_bbox=False)
    model = GEMEncoder(cfg, policy=FP32_POLICY)
    batch = {
        "input_ids": jnp.asarray(inputs["input_ids"]),
        "attention_mask": jnp.asarray(inputs["attention_mask"]),
        "xpath_tags_seq": jnp.asarray(inputs["xpath_tags_seq"]),
        "xpath_subs_seq": jnp.asarray(inputs["xpath_subs_seq"]),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    variables = import_gem_markuplm(sd, _j(variables))
    return {"hidden": np.asarray(model.apply(variables, batch))}


def run_docxlayout(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_docxlayout_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        import_docxlayout)
    from advancedliteratemachinery_tpu.models.dla import DLAConfig
    from advancedliteratemachinery_tpu.models.docxlayout import (
        DocXLayout, DocXLayoutConfig)
    from test_dla_import import CH

    cfg = DocXLayoutConfig(
        num_classes=3, num_secondary_classes=2, top_k=8, top_k_sub=4,
        dla=DLAConfig(levels=M.LEVELS, channels=CH), head_conv=M.HEAD_CONV)
    model = DocXLayout(cfg, policy=FP32_POLICY)
    x = jnp.asarray(inputs["image"])
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = import_docxlayout(sd, _j(variables))
    got = model.apply(variables, x, method=lambda m, im: m.backbone(im))
    return {h: np.asarray(got[h]) for h, _ in M.HEADS}


def run_vlpt(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_vlpt_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_vlpt
    from advancedliteratemachinery_tpu.models.vlpt import VLPT, VLPTConfig

    cfg = VLPTConfig(embed_dim=M.D, vocab_size=M.VOCAB, max_text_len=M.TLEN,
                     image_size=M.IMG, image_depth=1, text_depth=1,
                     co_depth=1, heads=M.HEADS, fpn_dim=M.BASE * 4,
                     resnet_base=M.BASE, resnet_blocks=(1, 1, 1, 1),
                     false_text_length=4)
    model = VLPT(cfg, policy=FP32_POLICY)
    ids = jnp.asarray(inputs["text_ids"])
    batch = {
        "image": jnp.asarray(inputs["image"]),
        "text_ids": ids,
        "text_ids_mlm": ids,
        "text_labels_mlm": jnp.full(ids.shape, -100, jnp.int32),
        "text_masks": jnp.ones(ids.shape, jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    variables = import_vlpt(sd, _j(variables))
    got = model.apply(variables, batch)
    return {k: np.asarray(got[k])
            for k in ("mlm_logits", "text_feats", "image_feats")}


def run_vgt(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_vgt_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_vgt
    from advancedliteratemachinery_tpu.models.vgt import (
        VGTBackbone, VGTConfig)

    cfg = VGTConfig(img_size=(64, 64), patch_size=16, embed_dim=M.D,
                    self_depth=M.DEPTH, cross_depth=0, num_heads=M.H,
                    grid_embedding_dim=M.GDIM, vocab_size=M.VOCAB,
                    out_indices=M.OUT_IDX, fpn_dim=M.FPN_DIM)
    model = VGTBackbone(cfg, policy=FP32_POLICY)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64), jnp.int32))
    variables = import_vgt(sd, _j(variables))
    got = model.apply(variables, jnp.asarray(inputs["image"]),
                      jnp.asarray(inputs["grid"]))
    return {k: np.asarray(got[k]) for k in ("p2", "p3", "p4", "p5", "p6")}


def run_lvtr(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_lvtr_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_lvtr
    from advancedliteratemachinery_tpu.models.lvtr import LVTRDalleUnet

    model = LVTRDalleUnet(M._cfg(), policy=FP32_POLICY)
    conds = {k[5:]: jnp.asarray(v) for k, v in inputs.items()
             if k.startswith("cond_")}
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(inputs["x"]),
        jnp.asarray(inputs["t"]), jnp.asarray(inputs["image_embed"]),
        jnp.asarray(inputs["text"]), conds)["params"]
    params = import_lvtr(sd, jax.tree.map(np.asarray, params))
    out = model.apply({"params": params}, jnp.asarray(inputs["x"]),
                      jnp.asarray(inputs["t"]),
                      jnp.asarray(inputs["image_embed"]),
                      jnp.asarray(inputs["text"]), conds)
    return {"eps_var": np.asarray(out)}


def run_trcg(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_trcg_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import import_trcg
    from advancedliteratemachinery_tpu.models.trcg import TRCG

    model = TRCG(M._flax_cfg(), policy=FP32_POLICY)
    img = jnp.asarray(inputs["image"])
    ids = jnp.asarray(inputs["ids"])
    params = model.init(jax.random.PRNGKey(0), img, ids)["params"]
    params = import_trcg(sd, params, n_heads=M.HEADS)
    return {"logits": np.asarray(model.apply({"params": params}, img, ids))}


def run_fid_web(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_fid_web_import as M

    from advancedliteratemachinery_tpu.engine.checkpoint import import_fid_web

    model = M._flax_model()
    args = tuple(jnp.asarray(inputs[k]) for k in
                 ("param_ids", "chrlen", "tags", "subs", "mask"))
    variables = model.init(jax.random.PRNGKey(0), *args,
                           jax.random.PRNGKey(1))
    variables = import_fid_web(sd, dict(variables))
    out = model.apply(variables, *args, jax.random.PRNGKey(1), sample=False)
    return {"logits": np.asarray(out["output"]),
            "pooled": np.asarray(out["hidden_state"])}


def run_geolayoutlm(sd, inputs):
    import jax
    import jax.numpy as jnp
    import test_geolayoutlm_import as M

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        import_geolayoutlm_backbone)
    from advancedliteratemachinery_tpu.models.bros import BrosTextEncoder
    from advancedliteratemachinery_tpu.models.geolayoutlm import GeoLayoutLM

    model = GeoLayoutLM(M.CFG, policy=FP32_POLICY)
    batch = {k: jnp.asarray(v) for k, v in inputs.items()}
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = import_geolayoutlm_backbone(
        sd, jax.tree.map(np.asarray, dict(variables))["params"])
    enc = BrosTextEncoder(M.BROS, policy=FP32_POLICY)
    text_enc, _ = enc.apply({"params": params["text_encoder"]},
                            batch["input_ids"],
                            batch["bbox_4p_normalized"],
                            batch["attention_mask"],
                            line_bbox=batch["bbox"])
    return {"text_enc": np.asarray(text_enc)}


RUNNERS = {"mgp_str": run_mgp_str, "lister": run_lister,
           "levocr": run_levocr, "lore": run_lore,
           "omniparser": run_omniparser, "webrpg_vae": run_webrpg_vae,
           "gem_markuplm": run_gem_markuplm, "docxlayout": run_docxlayout,
           "vlpt": run_vlpt, "vgt": run_vgt, "lvtr": run_lvtr,
           "trcg": run_trcg, "fid_web": run_fid_web,
           "geolayoutlm": run_geolayoutlm}

TOLERANCES = {"mgp_str": (2e-4, 2e-4), "lister": (1e-5, 1e-5),
              "levocr": (3e-3, 3e-3), "lore": (2e-3, 2e-3),
              "omniparser": (2e-3, 2e-3), "webrpg_vae": (1e-4, 1e-4),
              "gem_markuplm": (2e-3, 2e-3), "docxlayout": (2e-3, 2e-3),
              "vlpt": (5e-3, 5e-3), "vgt": (2e-3, 2e-3),
              "lvtr": (2e-3, 2e-3), "trcg": (2e-3, 2e-3),
              "fid_web": (2e-3, 2e-3), "geolayoutlm": (2e-3, 2e-3)}


# ---------------- per-family: torch artifact + expected outputs ----------------


def build(family):
    """→ (state_dict {str: torch.Tensor}, inputs {str: np.ndarray},
    expected {str: np.ndarray}, expected_source)."""
    import torch

    if family == "mgp_str":
        import test_checkpoint_import as M

        torch.manual_seed(0)
        tm = M.TorchMGPSTR().eval()
        img = np.random.default_rng(0).standard_normal(
            (2, 32, 128, 3)).astype(np.float32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        expected = {h: tout[h].numpy() for h in ("char", "bpe", "wp")}
        return dict(tm.state_dict()), {"image": img}, expected, "torch"

    if family == "lister":
        import tests.test_focalnet_import as fn

        fn.E = 8
        torch.manual_seed(2)
        tfn = fn.TFocalNet()
        sd = {"encoder." + k: v for k, v in tfn.state_dict().items()}
        C = 64
        torch.manual_seed(3)
        dec = {
            "eos_emb": torch.randn(C),
            "q_fc.weight": torch.randn(C, C), "q_fc.bias": torch.randn(C),
            "k_fc.weight": torch.randn(C, C), "k_fc.bias": torch.randn(C),
            "neighbor_navigator.weight": torch.randn(1, C, C),
            "neighbor_navigator.bias": torch.randn(1),
            "vis_cls.weight": torch.randn(37, C),
            "vis_cls.bias": torch.randn(37),
            "merge_layer.norm1.weight": torch.randn(C),
            "merge_layer.norm1.bias": torch.randn(C),
            "merge_layer.norm2.weight": torch.randn(C),
            "merge_layer.norm2.bias": torch.randn(C),
        }
        import test_lister_import as L

        blk = L.TLocalBlock(C, 2, 5, True)
        dec.update({f"cntx_module.attn_blocks.0.{k}": v
                    for k, v in blk.state_dict().items()})
        fn.E = 64
        mb = fn.TBlock(C, 1)
        dec.update({f"merge_layer.merge_layer.0.{k}": v
                    for k, v in mb.state_dict().items()})
        sd.update({"decoder." + k: v for k, v in dec.items()})
        img = np.random.default_rng(3).standard_normal(
            (2, 32, 64, 3)).astype(np.float32)
        inputs = {"image": img, "mask": np.ones((2, 32, 64), np.float32)}
        sd_np = {k: v.detach().numpy() for k, v in sd.items()}
        expected = run_lister(sd_np, inputs)       # flax regression pin
        return sd, inputs, expected, "flax"

    if family == "levocr":
        import test_levocr_import as M

        M.av.D, M.av.T, M.av.NC = M.DV, 6, 37
        torch.manual_seed(0)
        tm = M.TLevOCR().eval()
        img = np.random.default_rng(0).standard_normal(
            (2, 32, 128, 3)).astype(np.float32)
        rng = np.random.default_rng(1)
        noised = rng.integers(0, M.VOCAB, (2, M.MAXLEN)).astype(np.int32)
        masked = rng.integers(0, M.VOCAB, (2, M.MAXLEN)).astype(np.int32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                      torch.from_numpy(noised.astype(np.int64)),
                      torch.from_numpy(masked.astype(np.int64)))
        expected = {k: tout[k].numpy() for k in
                    ("vision_logits", "mask_ins_logits", "word_ins_logits",
                     "word_del_logits")}
        inputs = {"image": img, "noised": noised, "masked": masked}
        return dict(tm.state_dict()), inputs, expected, "torch"

    if family == "lore":
        import test_dla_import as M

        torch.manual_seed(0)
        tm = M.TDLASeg().eval()
        img = np.random.default_rng(0).standard_normal(
            (2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        expected = {h: tout[h].numpy().transpose(0, 2, 3, 1)
                    for h, _ in M.HEADS}
        return dict(tm.state_dict()), {"image": img}, expected, "torch"

    if family == "omniparser":
        import test_omniparser_import as M

        from advancedliteratemachinery_tpu.models.omniparser import (
            OmniParserConfig)
        from advancedliteratemachinery_tpu.models.swin import SwinConfig

        cfg = OmniParserConfig(
            d_model=M.DM, nhead=M.NHEAD, dec_layers=M.LAYERS,
            dim_feedforward=M.FFN, max_position_embeddings=M.MAXPOS,
            num_bins=M.NBINS, dropout=0.0, drop_path_rate=0.0,
            pt_seq_length=8, poly_length=4, rec_length=4, max_instances=4,
            swin=SwinConfig(embed_dim=M.D0, depths=M.DEPTHS,
                            num_heads=M.HEADS4, window_size=M.WIN,
                            drop_path_rate=0.0))
        nc = cfg.vocab().num_classes
        torch.manual_seed(0)
        tm = M.TorchOmniParser(nc).eval()
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
        seqs = {t: rng.integers(0, nc, (2, n)).astype(np.int32)
                for t, n in (("pt", 6), ("poly", 5), ("rec", 4))}
        with torch.no_grad():
            tout = tm(torch.from_numpy(img).permute(0, 3, 1, 2),
                      {t: torch.from_numpy(v.astype(np.int64))
                       for t, v in seqs.items()})
        expected = {t: tout[t].numpy() for t in ("pt", "poly", "rec")}
        inputs = {"image": img}
        inputs.update({f"seq_{t}": v for t, v in seqs.items()})
        return tm.state_dict_reference_names(), inputs, expected, "torch"

    if family == "webrpg_vae":
        import test_webrpg_import as M

        torch.manual_seed(0)
        tm = M.TVAE().eval()
        rng = np.random.default_rng(0)
        ids = rng.integers(0, M.VOCAB, (3, M.T))
        z = rng.standard_normal((3, M.LATENT)).astype(np.float32)
        with torch.no_grad():
            mu, logvar = tm.encode(torch.from_numpy(ids))
            dec = tm.decode(torch.from_numpy(z))
        expected = {"mu": mu.numpy(), "logvar": logvar.numpy(),
                    "dec": dec.numpy()}
        return (dict(tm.state_dict()),
                {"ids": ids.astype(np.int32), "z": z}, expected, "torch")

    if family == "gem_markuplm":
        import torch.nn as nn

        import test_gem_import as M

        torch.manual_seed(0)
        emb_word = nn.Embedding(M.VOCAB, M.H)
        emb_pos = nn.Embedding(M.POS, M.H)
        emb_tt = nn.Embedding(2, M.H)
        emb_ln = nn.LayerNorm(M.H, eps=1e-12)
        xpath = M.TXPath()
        layers = [M.TLayer() for _ in range(M.LAYERS)]
        sd = M.torch_sd(emb_word, emb_pos, emb_tt, emb_ln, xpath, layers)
        rng = np.random.default_rng(0)
        inputs = {
            "input_ids": rng.integers(0, M.VOCAB, (2, M.S)).astype(np.int32),
            "attention_mask": np.ones((2, M.S), np.float32),
            "xpath_tags_seq": rng.integers(
                0, M.TAGV, (2, M.S, M.DEPTH)).astype(np.int32),
            "xpath_subs_seq": rng.integers(
                0, M.SUBV, (2, M.S, M.DEPTH)).astype(np.int32),
        }
        ids = torch.from_numpy(inputs["input_ids"].astype(np.int64))
        with torch.no_grad():
            x = emb_word(ids) + emb_pos(torch.arange(M.S))[None] \
                + emb_tt(torch.zeros_like(ids)) \
                + xpath(torch.from_numpy(
                    inputs["xpath_tags_seq"].astype(np.int64)),
                    torch.from_numpy(
                        inputs["xpath_subs_seq"].astype(np.int64)))
            x = emb_ln(x)
            for l in layers:
                x = l(x)
        return sd, inputs, {"hidden": x.numpy()}, "torch"

    if family == "docxlayout":
        import test_docxlayout_import as M

        torch.manual_seed(0)
        tm = M.TDLASegV0().eval()
        img = np.random.default_rng(0).standard_normal(
            (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        expected = {h: want[h].numpy().transpose(0, 2, 3, 1)
                    for h, _ in M.HEADS}
        return dict(tm.state_dict()), {"image": img}, expected, "torch"

    if family == "vlpt":
        import test_vlpt_import as M

        torch.manual_seed(0)
        tm = M.TVLPT().eval()
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, M.IMG, M.IMG, 3)).astype(np.float32)
        ids = rng.integers(4, M.VOCAB, (2, M.TLEN))
        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                      torch.from_numpy(ids), torch.ones(2, M.TLEN))
        expected = {k: tout[k].numpy()
                    for k in ("mlm_logits", "text_feats", "image_feats")}
        inputs = {"image": img, "text_ids": ids.astype(np.int32)}
        return dict(tm.state_dict()), inputs, expected, "torch"

    if family == "vgt":
        import test_vgt_import as M

        torch.manual_seed(0)
        tm = M.TVGT().eval()
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        grid = rng.integers(0, M.VOCAB, (2, 64, 64))
        with torch.no_grad():
            want = tm(torch.from_numpy(img).permute(0, 3, 1, 2),
                      torch.from_numpy(grid))
        expected = {k: want[k].permute(0, 2, 3, 1).numpy()
                    for k in ("p2", "p3", "p4", "p5", "p6")}
        inputs = {"image": img, "grid": grid.astype(np.int32)}
        return dict(tm.state_dict()), inputs, expected, "torch"

    if family == "lvtr":
        import test_lvtr_import as M

        torch.manual_seed(0)
        tm = M.MUnet().eval()
        iv = M._inputs(1)
        expected = {"eps_var": M._torch_fwd(tm, iv)}
        inputs = {k: v for k, v in iv.items() if k != "conditions"}
        inputs.update({f"cond_{k}": v for k, v in iv["conditions"].items()})
        sd = {"unets.0." + k: v for k, v in tm.state_dict().items()}
        return sd, inputs, expected, "torch"

    if family == "trcg":
        import test_trcg_import as M

        torch.manual_seed(0)
        tm = M.THFTrcg().eval()
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, M.IMG, M.IMG, 3)).astype(np.float32)
        ids = rng.integers(0, M.VOCAB, (2, 5)).astype(np.int32)
        with torch.no_grad():
            want = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                      torch.from_numpy(ids.astype(np.int64))).numpy()
        return (dict(tm.state_dict_hf()), {"image": img, "ids": ids},
                {"logits": want}, "torch")

    if family == "fid_web":
        import test_fid_web_import as M

        torch.manual_seed(0)
        tm = M.TFidWeb().eval()
        iv = M._inputs(0)
        with torch.no_grad():
            logits, pooled = tm(
                torch.from_numpy(iv["param_ids"].astype(np.int64)),
                torch.from_numpy(iv["chrlen"].astype(np.int64)),
                torch.from_numpy(iv["tags"].astype(np.int64)),
                torch.from_numpy(iv["subs"].astype(np.int64)),
                torch.from_numpy(iv["mask"]))
        return (dict(tm.state_dict()), iv,
                {"logits": logits.numpy(), "pooled": pooled.numpy()},
                "torch")

    if family == "geolayoutlm":
        import test_geolayoutlm_import as M

        torch.manual_seed(0)
        tm = M.TBackbone().eval()
        rng = np.random.default_rng(0)
        B, S, N = 2, 12, 3
        inputs = {
            "input_ids": rng.integers(0, 60, (B, S)).astype(np.int32),
            "image": rng.integers(0, 255, (B, 64, 64, 3))
            .astype(np.float32),
            "bbox_4p_normalized": rng.random((B, S, 8)).astype(np.float32),
            "bbox": np.sort(rng.integers(0, 500, (B, S, 2, 2)), axis=3)
            .transpose(0, 1, 3, 2).reshape(B, S, 4).astype(np.int32),
            "attention_mask": np.ones((B, S), np.float32),
            "first_token_idxes": rng.integers(0, S, (B, N)).astype(np.int32),
            "block_mask": np.ones((B, N), np.float32),
        }
        with torch.no_grad():
            want = tm.text_encoder(
                torch.from_numpy(inputs["input_ids"].astype(np.int64)),
                torch.from_numpy(inputs["bbox_4p_normalized"]),
                torch.from_numpy(inputs["bbox"].astype(np.int64)),
                torch.from_numpy(inputs["attention_mask"])).numpy()
        sd = {"geolayoutlm_model." + k: v for k, v in tm.state_dict().items()}
        return sd, inputs, {"text_enc": want}, "torch"

    raise KeyError(family)

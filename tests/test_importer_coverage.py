"""Importer manifest coverage: every checkpoint tensor must be consumed.

VERDICT r3 item 4: the `_warn_unused` report (engine/checkpoint.py) was a
warning, not a failing test — a silently-skipped released tensor (a head,
a fusion layer, an extra stage) would never fail CI. These tests turn it
into an assert for EVERY family in TORCH_IMPORTERS:

- For the 14 golden families, the committed tests/golden/*.pth artifacts
  are released-layout checkpoints (DDP-shaped, full key manifests at tiny
  dims); replaying them through the real runner must consume every tensor
  (buffers like num_batches_tracked excepted — _BUFFER_SUFFIXES).
- Sub-importers composed by family importers (swin ⊂ omniparser,
  focalnet ⊂ lister, abinet_vision+levt ⊂ levocr, geolayoutlm_backbone ⊂
  geolayoutlm, dla ⊂ lore/docxlayout) are covered transitively; the
  registry-attribution test pins that mapping so a new importer can't
  land without coverage.
- lore_processor and vgt_cascade have no golden family of their own;
  they get direct manifest tests over the same torch mirrors their
  parity tests use. TRCG's released-scale manifest test lives in
  test_trcg_import.py::test_released_manifest_fully_covered.
"""

import os
import warnings

import numpy as np
import pytest

import golden_common as G


def _unmapped_warnings(caught):
    return [str(w.message) for w in caught if "not mapped" in str(w.message)]


# family fixture → importers its golden replay exercises (directly or via
# composition). Union over values ∪ STANDALONE must equal TORCH_IMPORTERS.
FAMILY_IMPORTERS = {
    "mgp_str": {"mgp_str"},
    "lister": {"lister", "focalnet"},
    "levocr": {"levocr", "abinet_vision", "levt"},
    "lore": {"dla"},
    "omniparser": {"omniparser", "swin"},
    "webrpg_vae": {"webrpg_vae"},
    "gem_markuplm": {"gem_markuplm"},
    "docxlayout": {"docxlayout"},
    "vlpt": {"vlpt"},
    "vgt": {"vgt"},
    "lvtr": {"lvtr"},
    "trcg": {"trcg"},
    "fid_web": {"fid_web"},
    "geolayoutlm": {"geolayoutlm_vie", "geolayoutlm_backbone"},
}
# importers with a dedicated manifest-coverage test below / elsewhere
STANDALONE = {"lore_processor", "vgt_cascade"}


def test_every_registered_importer_has_coverage():
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        TORCH_IMPORTERS)

    covered = set().union(*FAMILY_IMPORTERS.values()) | STANDALONE
    missing = set(TORCH_IMPORTERS) - covered
    assert not missing, (
        f"importers registered without manifest-coverage attribution: "
        f"{sorted(missing)} — add them to a golden family or a standalone "
        f"manifest test")


@pytest.mark.parametrize("family", G.FAMILIES)
def test_golden_checkpoint_fully_consumed(family):
    """The family importer must read 100% of its committed checkpoint's
    tensors (module buffers excepted) — zero 'not mapped' warnings."""
    pth = os.path.join(G.GOLDEN_DIR, f"{family}.pth")
    npz = os.path.join(G.GOLDEN_DIR, f"{family}.npz")
    if not (os.path.exists(pth) and os.path.exists(npz)):
        pytest.skip("golden fixtures not generated")
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        load_torch_state_dict)

    sd = load_torch_state_dict(pth)
    data = np.load(npz)
    inputs = {k[3:]: data[k] for k in data.files if k.startswith("in_")}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        G.RUNNERS[family](sd, inputs)
    msgs = _unmapped_warnings(caught)
    assert not msgs, f"{family}: unconsumed checkpoint tensors: {msgs}"


def test_lore_processor_manifest_fully_covered():
    """Direct manifest test: the Processor mirror (classifier.py:51 layout,
    incl. the dead Encoder.norm/pe members real checkpoints contain)."""
    import jax
    import jax.numpy as jnp
    import torch
    import test_lore_processor_import as LP

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        import_lore_processor)
    from advancedliteratemachinery_tpu.models.lore import (
        LoreConfig, LoreProcessor)

    torch.manual_seed(0)
    tm = LP.TorchProcessor().eval()
    cfg = LoreConfig(input_size=LP.HID, hidden_size=LP.HID,
                     tsfm_layers=LP.LAYERS, stacking_layers=LP.STACK_LAYERS,
                     num_heads=LP.HEADS, max_fmp_size=LP.FMP)
    proc = LoreProcessor(cfg, policy=FP32_POLICY)
    params = proc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, LP.HID)),
                       jnp.zeros((1, 3, 8)))["params"]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        import_lore_processor(
            {k: v.numpy() for k, v in tm.state_dict().items()},
            jax.tree.map(np.asarray, params))
    msgs = _unmapped_warnings(caught)
    assert not msgs, f"lore_processor: unconsumed tensors: {msgs}"


def test_vgt_cascade_manifest_fully_covered():
    """Direct manifest test: detectron2-layout RPN + 3-stage cascade head
    keys on top of the VGT backbone mirror."""
    import jax
    import jax.numpy as jnp
    import torch
    import test_vgt_import as VI

    from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        import_vgt_cascade)
    from advancedliteratemachinery_tpu.models.rcnn import (
        CascadeConfig, VGTCascadeDetector)
    from advancedliteratemachinery_tpu.models.vgt import VGTConfig

    torch.manual_seed(1)
    tm = VI.TVGT().eval()
    bb_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    r, fc, K = 3, 24, 4
    head_sd, _ = VI.TestCascadeImport()._torch_head_sd(VI.FPN_DIM, r, fc, K)
    sd = {**bb_sd, **head_sd}

    bcfg = VGTConfig(img_size=(64, 64), patch_size=16, embed_dim=VI.D,
                     self_depth=VI.DEPTH, cross_depth=0, num_heads=VI.H,
                     grid_embedding_dim=VI.GDIM, vocab_size=VI.VOCAB,
                     out_indices=VI.OUT_IDX, fpn_dim=VI.FPN_DIM)
    ccfg = CascadeConfig(num_classes=K, pre_nms_topk=32, post_nms_topk=16,
                         detections_per_image=8, fc_dim=fc,
                         pooler_resolution=r)
    det = VGTCascadeDetector(bcfg, ccfg, policy=FP32_POLICY)
    imgs = jnp.zeros((1, 64, 64, 3))
    grid = jnp.zeros((1, 64, 64), jnp.int32)
    variables = det.init(jax.random.PRNGKey(0), imgs, grid)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        import_vgt_cascade(sd, jax.tree.map(np.asarray, variables),
                           pooler_resolution=r)
    msgs = _unmapped_warnings(caught)
    assert not msgs, f"vgt_cascade: unconsumed tensors: {msgs}"

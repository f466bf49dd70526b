"""Checkpoint layer: Orbax persistence + PyTorch-checkpoint import.

Replaces the reference's per-project torch.save/load conventions
(SURVEY.md §5: MGP-STR rank0 saves train_final_dist.py:228; LISTER
SaveAndLoad utils.py:177; OmniParser Checkpointer utils/checkpointer.py:5
with embedding-resize surgery :9; GeoLayoutLM key surgery
model/geolayoutlm_vie.py:58) with one Orbax-based store, plus converters
that map PyTorch state_dicts into this framework's flax param trees so the
reference's released checkpoints can be imported for output-fidelity
parity.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------- Orbax persistence ----------------


def save_checkpoint(path: str, state: Any, step: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(f"{path}/step_{step}" if step is not None else path, state)


def restore_checkpoint(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def load_params_checkpoint(path: str, target: Any) -> Any:
    """Inference-side loader that accepts ANY repo checkpoint artifact:

    - a raw params/variables tree (``cli import-ckpt`` output) — the
      reference-analog of loading a converted state dict;
    - a ``fit()`` train-state save (``step_N``/``best`` payload
      ``{step, params, opt_state[, batch_stats]}``) — the inference
      subtree is extracted, so ``--ckpt runs/x/step_5000`` works;
    - a training *run dir* (``--ckpt runs/x``) — resolves to ``best``
      when present, else the newest ``step_N`` (MGP-STR's best-acc save
      convention, train_final_dist.py:195-228).
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "_METADATA")):
        entries = os.listdir(path)
        steps = sorted((int(m.group(1)) for e in entries
                        if (m := re.match(r"step_(\d+)$", e))))
        if "best" in entries:
            path = os.path.join(path, "best")
        elif steps:
            path = os.path.join(path, f"step_{steps[-1]}")

    with ocp.StandardCheckpointer() as ckptr:
        try:
            return ckptr.restore(path, target)
        except Exception:
            raw = ckptr.restore(path)          # untyped: raw saved pytree

    if isinstance(raw, dict) and "opt_state" in raw and "params" in raw:
        # fit() payload → take the inference subtree(s)
        if isinstance(target, dict) and "params" in target:
            missing = [k for k in target if k not in raw]
            if missing:
                raise ValueError(
                    f"{path}: train-state checkpoint lacks collections "
                    f"{missing} required by this model")
            raw = {k: raw[k] for k in target}
        else:
            raw = raw["params"]

    flat_t = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_r, treedef_r = jax.tree_util.tree_flatten_with_path(raw)
    if [p for p, _ in flat_t] != [p for p, _ in flat_r]:
        raise ValueError(
            f"{path}: checkpoint tree does not match the model "
            f"({len(flat_r)} vs {len(flat_t)} leaves) — wrong model, "
            f"variant, or artifact kind")
    for (kp, t), (_, r) in zip(flat_t, flat_r):
        if tuple(getattr(t, "shape", ())) != tuple(getattr(r, "shape", ())):
            name = jax.tree_util.keystr(kp)
            raise ValueError(
                f"{path}: shape mismatch at {name}: checkpoint "
                f"{tuple(r.shape)} vs model {tuple(t.shape)} (wrong "
                f"variant?)")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target),
        [jnp.asarray(r, getattr(t, "dtype", None))
         for (_, t), (_, r) in zip(flat_t, flat_r)])


# ---------------- PyTorch import ----------------


def _t(x) -> np.ndarray:
    """torch tensor → numpy (no torch import needed at call sites)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def load_torch_state_dict(path: str, trusted: bool = False) -> Dict[str, np.ndarray]:
    """Load a released checkpoint safely: torch .pth/.bin (weights_only),
    .safetensors, or a sharded HF `*.index.json` (shards merged).

    Defaults to ``weights_only=True`` — released checkpoints are untrusted
    third-party artifacts and full pickle deserialization executes arbitrary
    code. Pass ``trusted=True`` only for checkpoints you built yourself that
    genuinely need legacy pickle (e.g. whole-module saves).
    """
    import os

    def finish(sd):
        for key in ("model", "state_dict", "net"):
            if isinstance(sd, dict) and key in sd and isinstance(sd[key],
                                                                 dict):
                sd = sd[key]
        # strip DDP 'module.' prefixes (reference wraps models in DDP)
        return {re.sub(r"^module\.", "", k): _t(v) for k, v in sd.items()}

    if path.endswith(".safetensors"):
        from safetensors import numpy as st

        return finish(dict(st.load_file(path)))
    if path.endswith(".index.json"):
        # HF sharded checkpoint: {"weight_map": {tensor: shard_file}}
        import json

        with open(path, encoding="utf-8") as f:
            index = json.load(f)
        base = os.path.dirname(os.path.abspath(path))
        merged: Dict[str, np.ndarray] = {}
        for shard in sorted(set(index["weight_map"].values())):
            merged.update(load_torch_state_dict(os.path.join(base, shard),
                                                trusted=trusted))
        return merged

    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=not trusted)
    except Exception:
        if not trusted:
            raise RuntimeError(
                f"{path} is not loadable with weights_only=True; if you "
                "trust its origin, retry with trusted=True"
            )
        raise
    return finish(sd)


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv [O, I, kh, kw] → flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch linear [O, I] → flax [I, O]."""
    return np.transpose(w, (1, 0))


class _TrackingDict(dict):
    """Records which checkpoint keys an importer actually read, so unused
    (silently skipped) weights can be reported."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read: set = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):
        self.read.add(key)
        return super().__contains__(key)


_BUFFER_SUFFIXES = ("num_batches_tracked", "position_ids", ".pe", "version",
                    "relative_position_index")


def _warn_unused(p: "_TrackingDict", importer: str) -> None:
    unused = [k for k in p if k not in p.read
              and not any(k.endswith(s) for s in _BUFFER_SUFFIXES)]
    if unused:
        import warnings
        warnings.warn(
            f"{importer}: {len(unused)} checkpoint tensors were not mapped "
            f"onto the model (first few: {sorted(unused)[:4]}) — extra heads "
            f"or a richer variant than this config", stacklevel=3)


def _validate_shapes(ref: Dict, imported: Dict, importer: str) -> Dict:
    """Fail at import time (not at apply time) if any imported leaf's shape
    disagrees with the model's param tree — catches variant mismatches whose
    keys happen to line up."""
    def named(tree):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        return {"/".join(str(getattr(k, "key", k)) for k in path): leaf
                for path, leaf in flat}

    expect = {k: np.shape(v) for k, v in named(ref).items()}
    for name, leaf in named(imported).items():
        if name in expect and expect[name] != np.shape(leaf):
            raise ValueError(
                f"{importer}: checkpoint leaf '{name}' has shape "
                f"{np.shape(leaf)} but the model expects {expect[name]} — "
                f"wrong variant/config for this checkpoint?")
    return imported


def import_mgp_str(sd: Dict[str, np.ndarray], params: Dict,
                   vocab_pad_multiple: int = 128) -> Dict:
    """Map an MGP-STR torch checkpoint (timm ViT + TokenLearners + heads,
    reference modules/mgp_str.py) onto our param tree. Head vocab dims are
    zero-padded up to our MXU-aligned sizes."""
    out = jax.tree.map(np.asarray, params)
    p = _TrackingDict({k[len("mgp_str."):] if k.startswith("mgp_str.") else k: v
                        for k, v in sd.items()})

    enc = out["encoder"]
    enc["patch_embed"]["proj"]["kernel"] = conv_kernel(p["patch_embed.proj.weight"])
    enc["patch_embed"]["proj"]["bias"] = p["patch_embed.proj.bias"]
    enc["cls_token"] = p["cls_token"]
    enc["pos_embed"] = p["pos_embed"]
    n_blocks = sum(1 for k in enc if k.startswith("blocks_"))
    for i in range(n_blocks):
        b = enc[f"blocks_{i}"]
        pre = f"blocks.{i}."
        b["norm1"]["scale"] = p[pre + "norm1.weight"]
        b["norm1"]["bias"] = p[pre + "norm1.bias"]
        b["attn"]["qkv"]["kernel"] = linear_kernel(p[pre + "attn.qkv.weight"])
        if pre + "attn.qkv.bias" in p:
            b["attn"]["qkv"]["bias"] = p[pre + "attn.qkv.bias"]
        b["attn"]["proj"]["kernel"] = linear_kernel(p[pre + "attn.proj.weight"])
        b["attn"]["proj"]["bias"] = p[pre + "attn.proj.bias"]
        b["norm2"]["scale"] = p[pre + "norm2.weight"]
        b["norm2"]["bias"] = p[pre + "norm2.bias"]
        b["mlp"]["fc1"]["kernel"] = linear_kernel(p[pre + "mlp.fc1.weight"])
        b["mlp"]["fc1"]["bias"] = p[pre + "mlp.fc1.bias"]
        b["mlp"]["fc2"]["kernel"] = linear_kernel(p[pre + "mlp.fc2.weight"])
        b["mlp"]["fc2"]["bias"] = p[pre + "mlp.fc2.bias"]

    for head in ("char", "bpe", "wp"):
        tl = out[f"{head}_token_learner"]
        pre = f"{head}_tokenLearner."
        tl["token_norm"]["scale"] = p[pre + "token_norm.weight"]
        tl["token_norm"]["bias"] = p[pre + "token_norm.bias"]
        # torch grouped conv [O, I/G, 1, 1] → our [G, I/G, O/G]
        w0 = p[pre + "tokenLearner.0.weight"][:, :, 0, 0]      # [D, D/8]
        tl["select_group"]["kernel"] = _grouped_from_torch(w0, groups=8)
        w1 = p[pre + "tokenLearner.1.weight"][:, :, 0, 0]      # [T, D]
        tl["select_proj"]["kernel"] = np.transpose(w1, (1, 0))
        wf = p[pre + "feat.weight"][:, :, 0, 0]
        tl["feat"]["kernel"] = _grouped_from_torch(wf, groups=8)
        tl["norm"]["scale"] = p[pre + "norm.weight"]
        tl["norm"]["bias"] = p[pre + "norm.bias"]

        hw = linear_kernel(p[f"{head}_head.weight"])
        hb = p[f"{head}_head.bias"]
        tgt = out[f"{head}_head"]["kernel"]
        padded = np.zeros_like(tgt)
        padded[:, : hw.shape[1]] = hw
        out[f"{head}_head"]["kernel"] = padded
        pb = np.zeros_like(out[f"{head}_head"]["bias"])
        # padded vocab columns get a very negative bias so they never win
        pb[:] = -1e4
        pb[: hb.shape[0]] = hb
        out[f"{head}_head"]["bias"] = pb

    _warn_unused(p, "import_mgp_str")
    return jax.tree.map(jnp.asarray, _validate_shapes(params, out, 'import_mgp_str'))


def _grouped_from_torch(w: np.ndarray, groups: int) -> np.ndarray:
    """torch grouped 1x1 conv weight [O, I/G] → our block-diag [G, I/G, O/G].

    torch computes out[g*O/G + o] = Σ_i w[g*O/G + o, i] · x[g*I/G + i];
    ours: out[..., g, o] = Σ_i x[..., g, i] · kernel[g, i, o].
    """
    O, Ig = w.shape
    Og = O // groups
    return np.stack([np.transpose(w[g * Og:(g + 1) * Og], (1, 0))
                     for g in range(groups)], axis=0)


def resize_embedding(new_params: Dict, old_params: Dict,
                     replace_paths: list, added_rows: int) -> Dict:
    """Checkpoint surgery when fine-tuning adds vocabulary entries
    (reference OmniParser utils/checkpointer.py:9 resize_embedding: the old
    weights fill rows [:-added_rows] of the grown tables; all other keys
    copy over). Paths are tuples of keys into the param tree."""
    import copy

    out = jax.tree.map(np.asarray, new_params)

    def get(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    def setval(tree, path, val):
        for k in path[:-1]:
            tree = tree[k]
        tree[path[-1]] = val

    flat_new, _ = jax.tree_util.tree_flatten_with_path(out)
    replace = {tuple(str(getattr(k, "key", k)) for k in p) for p in
               [tuple(rp) for rp in replace_paths]}
    for path, leaf in jax.tree_util.tree_flatten_with_path(out)[0]:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        old = old_params
        try:
            for k in key:
                old = old[k]
        except (KeyError, TypeError):
            continue
        old = np.asarray(old)
        if key in replace:
            grown = np.asarray(leaf).copy()
            # rows grow on axis 0 for embeddings/biases, axis -1 for kernels
            if grown.shape[0] == old.shape[0] + added_rows and \
                    grown.shape[1:] == old.shape[1:]:
                grown[:-added_rows] = old
            elif grown.ndim >= 1 and grown.shape[-1] == old.shape[-1] + added_rows:
                grown[..., :-added_rows] = old
            else:
                raise ValueError(f"unexpected resize shapes {old.shape} → "
                                 f"{grown.shape} at {key}")
            setval(out, [getattr(k, "key", k) for k in path], grown)
        else:
            if old.shape != np.asarray(leaf).shape:
                raise ValueError(f"shape mismatch at {key}: {old.shape} vs "
                                 f"{np.asarray(leaf).shape}")
            setval(out, [getattr(k, "key", k) for k in path], old)
    return out


def import_swin(sd: Dict[str, np.ndarray], params: Dict,
                prefix: str = "") -> Dict:
    """Map a timm/microsoft Swin checkpoint (swin_base_patch4_window7_224
    layout — the backbone OmniParser initializes from, parser.py:37) onto
    our SwinTransformer param tree.

    torch keys: patch_embed.proj/.norm, layers.{s}.blocks.{b}.{norm1,
    attn.{qkv,proj,relative_position_bias_table},norm2,mlp.fc1/fc2},
    layers.{s}.downsample.{reduction,norm}. The relative_position_index
    buffer is recomputed here, not imported."""
    out = jax.tree.map(np.asarray, params)
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    out["patch_embed"]["kernel"] = conv_kernel(p["patch_embed.proj.weight"])
    out["patch_embed"]["bias"] = p["patch_embed.proj.bias"]
    out["patch_norm"]["scale"] = p["patch_embed.norm.weight"]
    out["patch_norm"]["bias"] = p["patch_embed.norm.bias"]

    stage = 0
    block = 0
    while f"stage{stage}_block0" in out:
        b = 0
        while f"stage{stage}_block{b}" in out:
            dst = out[f"stage{stage}_block{b}"]
            pre = f"layers.{stage}.blocks.{b}."
            dst["norm1"]["scale"] = p[pre + "norm1.weight"]
            dst["norm1"]["bias"] = p[pre + "norm1.bias"]
            dst["attn"]["qkv"]["kernel"] = linear_kernel(p[pre + "attn.qkv.weight"])
            dst["attn"]["qkv"]["bias"] = p[pre + "attn.qkv.bias"]
            dst["attn"]["proj"]["kernel"] = linear_kernel(p[pre + "attn.proj.weight"])
            dst["attn"]["proj"]["bias"] = p[pre + "attn.proj.bias"]
            dst["attn"]["relative_position_bias_table"] = \
                p[pre + "attn.relative_position_bias_table"]
            dst["norm2"]["scale"] = p[pre + "norm2.weight"]
            dst["norm2"]["bias"] = p[pre + "norm2.bias"]
            dst["mlp_fc1"]["kernel"] = linear_kernel(p[pre + "mlp.fc1.weight"])
            dst["mlp_fc1"]["bias"] = p[pre + "mlp.fc1.bias"]
            dst["mlp_fc2"]["kernel"] = linear_kernel(p[pre + "mlp.fc2.weight"])
            dst["mlp_fc2"]["bias"] = p[pre + "mlp.fc2.bias"]
            b += 1
        if f"merge{stage}" in out:
            pre = f"layers.{stage}.downsample."
            out[f"merge{stage}"]["reduction"]["kernel"] = linear_kernel(
                p[pre + "reduction.weight"])
            out[f"merge{stage}"]["norm"]["scale"] = p[pre + "norm.weight"]
            out[f"merge{stage}"]["norm"]["bias"] = p[pre + "norm.bias"]
        # per-stage output norms (OmniParser adds norm{i}; classification
        # checkpoints lack them → keep the identity init)
        if f"norm{stage}.weight" in p and f"out_norm{stage}" in out:
            out[f"out_norm{stage}"]["scale"] = p[f"norm{stage}.weight"]
            out[f"out_norm{stage}"]["bias"] = p[f"norm{stage}.bias"]
        stage += 1
    _warn_unused(p, "import_swin")
    return jax.tree.map(jnp.asarray, _validate_shapes(params, out, 'import_swin'))


def _focal_block(p: Dict[str, np.ndarray], dst: Dict, pre: str) -> None:
    """One torch FocalNetBlock (feature_extractor.py:142) → our FocalNetBlock
    param subtree (shared by the FocalNet stages and LISTER's FEM merge)."""
    dst["norm1"]["scale"] = p[pre + "norm1.weight"]
    dst["norm1"]["bias"] = p[pre + "norm1.bias"]
    mod = dst["modulation"]
    mp = pre + "modulation."
    mod["f"]["kernel"] = linear_kernel(p[mp + "f.weight"])
    mod["f"]["bias"] = p[mp + "f.bias"]
    mod["h"]["kernel"] = p[mp + "h.weight"][:, :, 0, 0].T
    mod["h"]["bias"] = p[mp + "h.bias"]
    mod["proj"]["kernel"] = linear_kernel(p[mp + "proj.weight"])
    mod["proj"]["bias"] = p[mp + "proj.bias"]
    level = 0
    while f"focal_{level}" in mod:
        mod[f"focal_{level}"]["kernel"] = conv_kernel(
            p[mp + f"focal_layers.{level}.0.weight"])
        level += 1
    dst["norm2"]["scale"] = p[pre + "norm2.weight"]
    dst["norm2"]["bias"] = p[pre + "norm2.bias"]
    dst["mlp_fc1"]["kernel"] = linear_kernel(p[pre + "mlp.fc1.weight"])
    dst["mlp_fc1"]["bias"] = p[pre + "mlp.fc1.bias"]
    dst["mlp_fc2"]["kernel"] = linear_kernel(p[pre + "mlp.fc2.weight"])
    dst["mlp_fc2"]["bias"] = p[pre + "mlp.fc2.bias"]
    if pre + "gamma_1" in p:
        dst["gamma_1"] = p[pre + "gamma_1"]
        dst["gamma_2"] = p[pre + "gamma_2"]


def import_focalnet(sd: Dict[str, np.ndarray], params: Dict,
                    prefix: str = "encoder.") -> Dict:
    """Map a LISTER FocalNet-lrf state dict (OCR/LISTER/model/
    feature_extractor.py) onto our FocalNet param tree.

    torch keys: patch_embed.proj.{conv0,norm0,conv1_0,norm_1,conv1_1,
    conv2_0,norm2,conv2_1,conv3} (Stem), layers.{s}.blocks.{b}.{norm1,
    modulation.{f,h,proj,focal_layers.{l}.0},norm2,mlp.fc1/fc2,gamma_1/2},
    layers.{s}.downsample.proj (MaskedConv) + .norm, final `norm`."""
    out = jax.tree.map(np.asarray, params)
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    stem = out["stem"]
    sp = "patch_embed.proj."
    for ours, theirs, is_conv in (
            ("conv0", "conv0", True), ("norm0", "norm0", False),
            ("conv1_0", "conv1_0", True), ("norm1", "norm_1", False),
            ("conv1_1", "conv1_1", True), ("conv2_0", "conv2_0", True),
            ("norm2", "norm2", False), ("conv2_1", "conv2_1", True)):
        if is_conv:
            stem[ours]["Conv_0"]["kernel"] = conv_kernel(p[sp + theirs + ".weight"])
            stem[ours]["Conv_0"]["bias"] = p[sp + theirs + ".bias"]
        else:
            stem[ours]["scale"] = p[sp + theirs + ".weight"]
            stem[ours]["bias"] = p[sp + theirs + ".bias"]
    stem["conv3"]["kernel"] = linear_kernel(p[sp + "conv3.weight"])
    stem["conv3"]["bias"] = p[sp + "conv3.bias"]
    if "patch_embed.norm.weight" in p:
        out["stem_norm"]["scale"] = p["patch_embed.norm.weight"]
        out["stem_norm"]["bias"] = p["patch_embed.norm.bias"]

    s = 0
    while f"stage{s}_block0" in out:
        b = 0
        while f"stage{s}_block{b}" in out:
            _focal_block(p, out[f"stage{s}_block{b}"],
                         f"layers.{s}.blocks.{b}.")
            b += 1
        if f"downsample{s}" in out:
            pre = f"layers.{s}.downsample."
            ds = out[f"downsample{s}"]["Conv_0"]
            ds["kernel"] = conv_kernel(p[pre + "proj.weight"])
            ds["bias"] = p[pre + "proj.bias"]
            out[f"ds_norm{s}"]["scale"] = p[pre + "norm.weight"]
            out[f"ds_norm{s}"]["bias"] = p[pre + "norm.bias"]
        s += 1

    out["norm"]["scale"] = p["norm.weight"]
    out["norm"]["bias"] = p["norm.bias"]
    _warn_unused(p, "import_focalnet")
    return jax.tree.map(jnp.asarray, _validate_shapes(params, out, 'import_focalnet'))


def import_lister(sd: Dict[str, np.ndarray], params: Dict) -> Dict:
    """Map a full LISTER checkpoint (OCR/LISTER/model/model.py:40 — encoder
    FocalNet + nb_decoder.py:98 NeighborDecoder with BilinearLayer navigator,
    la_utils.py LocalAttentionModule, FeatureMapEnhancer) onto our LISTER
    param tree. Composes import_focalnet for the encoder."""
    out = jax.tree.map(np.asarray, params)
    out["encoder"] = jax.tree.map(
        np.asarray, import_focalnet(sd, params["encoder"], prefix="encoder."))
    p = _TrackingDict({k[len("decoder."):]: v for k, v in sd.items()
                        if k.startswith("decoder.")})
    de = out["decoder"]

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        if t + ".bias" in p and "bias" in dst:
            dst["bias"] = p[t + ".bias"]

    de["eos_emb"] = p["eos_emb"]
    lin(de["q_fc"], "q_fc")
    lin(de["k_fc"], "k_fc")
    # BilinearLayer out=1: y = q · W[0] · k + b[0] (nb_decoder.py:43)
    de["neighbor_navigator"]["weight"] = p["neighbor_navigator.weight"][0]
    de["neighbor_navigator"]["bias"] = np.asarray(
        p["neighbor_navigator.bias"])[0]
    lin(de["vis_cls"], "vis_cls")

    if "cntx_module" in de:
        cm = de["cntx_module"]
        i = 0
        while f"sa_{i}" in cm:
            pre = f"cntx_module.attn_blocks.{i}."
            cm[f"gamma1_{i}"] = p[pre + "gamma_1"]
            cm[f"gamma2_{i}"] = p[pre + "gamma_2"]
            for n, t in (("norm1", "norm1"), ("norm2", "norm2")):
                cm[f"{n}_{i}"]["scale"] = p[pre + t + ".weight"]
                cm[f"{n}_{i}"]["bias"] = p[pre + t + ".bias"]
            sa = cm[f"sa_{i}"]
            lin(sa["q_fc"], pre + "sa.q_fc")
            lin(sa["kv_fc"], pre + "sa.kv_fc")
            lin(sa["proj"], pre + "sa.proj")
            if "kv_pos_bias" in sa:
                sa["kv_pos_bias"] = p[pre + "sa.kv_pos_bias"]
            # torch mlp Sequential: Linear(0), GELU, Dropout, Linear(3)
            lin(cm[f"mlp_fc1_{i}"], pre + "mlp.0")
            lin(cm[f"mlp_fc2_{i}"], pre + "mlp.3")
            i += 1

    if "merge_layer" in de:
        ml = de["merge_layer"]
        for n in ("norm1", "norm2"):
            ml[n]["scale"] = p[f"merge_layer.{n}.weight"]
            ml[n]["bias"] = p[f"merge_layer.{n}.bias"]
        i = 0
        while f"merge_{i}" in ml:
            _focal_block(p, ml[f"merge_{i}"], f"merge_layer.merge_layer.{i}.")
            i += 1

    _warn_unused(p, "import_lister")
    return jax.tree.map(jnp.asarray, _validate_shapes(params, out, "import_lister"))


def _dcn_offset_perm(K: int) -> np.ndarray:
    """torch DCNv2 conv_offset_mask emits interleaved (y_k, x_k) pairs then
    K mask channels (dcn_v2.py:147 + the CUDA kernel's 2k/2k+1 indexing);
    our DeformConv2d splits [dy*K, dx*K, mask*K]."""
    return np.concatenate([np.arange(K) * 2, np.arange(K) * 2 + 1,
                           2 * K + np.arange(K)])


def import_dla(sd: Dict[str, np.ndarray], variables: Dict,
               prefix: str = "") -> Dict:
    """Map a LORE-TSR / CenterNet DLASeg (ctdet) state dict onto our DLASeg
    variables (reference pose_dla_dcn.py: DLA :224, DLAUp :390, IDAUp :361,
    DeformConv :346, heads :443). Takes and returns the FULL flax variables
    dict ({"params", "batch_stats"}) because BatchNorm running stats live in
    their own collection.

    Note: the DCN *sampling* parity (offset sign/interleave conventions of
    ops.deform_conv2d vs the reference CUDA kernel) is asserted structurally
    via _dcn_offset_perm; weight/bias/BN parity is covered by the mirror
    test with zero offsets."""
    out = jax.tree.map(np.asarray, variables)
    pr, st = out["params"], out["batch_stats"]
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    def bn(dst_p, dst_s, t):
        dst_p["scale"] = p[t + ".weight"]
        dst_p["bias"] = p[t + ".bias"]
        dst_s["mean"] = p[t + ".running_mean"]
        dst_s["var"] = p[t + ".running_var"]

    def cbr(dst_p, dst_s, tconv, tbn):
        dst_p["conv"]["kernel"] = conv_kernel(p[tconv + ".weight"])
        bn(dst_p["bn"], dst_s["bn"], tbn)

    def basic_block(dst_p, dst_s, pre):
        cbr(dst_p["conv1"], dst_s["conv1"], pre + ".conv1", pre + ".bn1")
        cbr(dst_p["conv2"], dst_s["conv2"], pre + ".conv2", pre + ".bn2")

    def tree(dst_p, dst_s, pre):
        if pre + ".conv1.weight" in p:              # leaf BasicBlock
            basic_block(dst_p, dst_s, pre)
            return
        if pre + ".project.0.weight" in p:
            cbr(dst_p["project"], dst_s["project"],
                pre + ".project.0", pre + ".project.1")
        if pre + ".root.conv.weight" in p:
            cbr(dst_p["root"]["conv"], dst_s["root"]["conv"],
                pre + ".root.conv", pre + ".root.bn")
        tree(dst_p["tree1"], dst_s["tree1"], pre + ".tree1")
        tree(dst_p["tree2"], dst_s["tree2"], pre + ".tree2")

    base_p, base_s = pr["base"], st["base"]
    cbr(base_p["base_layer"], base_s["base_layer"],
        "base.base_layer.0", "base.base_layer.1")
    cbr(base_p["level0"], base_s["level0"], "base.level0.0", "base.level0.1")
    cbr(base_p["level1"], base_s["level1"], "base.level1.0", "base.level1.1")
    for lv in range(2, 6):
        tree(base_p[f"level{lv}"], base_s[f"level{lv}"], f"base.level{lv}")

    def dcn_block(dst_p, dst_s, pre):
        w = p[pre + ".conv.weight"]
        dst_p["dcn"]["kernel"] = conv_kernel(w)
        dst_p["dcn"]["bias"] = p[pre + ".conv.bias"]
        K = w.shape[2] * w.shape[3]
        perm = _dcn_offset_perm(K)
        om = dst_p["dcn"]["conv_offset_mask"]
        om["kernel"] = conv_kernel(p[pre + ".conv.conv_offset_mask.weight"][perm])
        om["bias"] = p[pre + ".conv.conv_offset_mask.bias"][perm]
        bn(dst_p["bn"], dst_s["bn"], pre + ".actf.0")

    def ida(dst_p, dst_s, pre):
        j = 1
        while pre + f".proj_{j}.conv.weight" in p:
            dcn_block(dst_p[f"proj_{j}"], dst_s[f"proj_{j}"], pre + f".proj_{j}")
            dcn_block(dst_p[f"node_{j}"], dst_s[f"node_{j}"], pre + f".node_{j}")
            if f"up_{j}" in dst_p:   # factor-1 ups have no kernel
                dst_p[f"up_{j}"]["kernel"] = np.transpose(
                    p[pre + f".up_{j}.weight"][:, 0], (1, 2, 0))
            j += 1

    i = 0
    while f"dla_up.ida_{i}.proj_1.conv.weight" in p:
        ida(pr["dla_up"][f"ida_{i}"], st["dla_up"][f"ida_{i}"],
            f"dla_up.ida_{i}")
        i += 1
    ida(pr["ida_up"], st["ida_up"], "ida_up")

    heads = sorted({k.split(".")[0] for k in p
                    if k.endswith(".weight") and k.split(".")[0] + "_conv1" in pr})
    for head in heads:
        pr[f"{head}_conv1"]["kernel"] = conv_kernel(p[head + ".0.weight"])
        pr[f"{head}_conv1"]["bias"] = p[head + ".0.bias"]
        pr[f"{head}_out"]["kernel"] = conv_kernel(p[head + ".2.weight"])
        pr[f"{head}_out"]["bias"] = p[head + ".2.bias"]

    _warn_unused(p, "import_dla")
    return jax.tree.map(jnp.asarray, _validate_shapes(variables, out, "import_dla"))


def import_docxlayout(sd: Dict[str, np.ndarray], variables: Dict,
                      prefix: str = "") -> Dict:
    """Map the released DocXLayout checkpoint (DocXLayout_231012.pth —
    reference DocumentUnderstanding/DocXLayout/models/networks/
    dlav0_subfield.py DLASeg) onto our DocXLayout variables (DLASegV0:
    v0 neck — proj conv1x1+BN, fixed-bilinear grouped ConvTranspose ups,
    concat-node conv3x3+BN; no DCN). Shares the DLA trunk key layout with
    import_dla; neck keys are `dla_up.ida_{i}.{proj,up,node}_{j}.*` with
    torch Sequential indices (.0 conv / .1 bn)."""
    out = jax.tree.map(np.asarray, variables)
    pr, st = out["params"], out["batch_stats"]
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    def bn(dst_p, dst_s, t):
        dst_p["scale"] = p[t + ".weight"]
        dst_p["bias"] = p[t + ".bias"]
        dst_s["mean"] = p[t + ".running_mean"]
        dst_s["var"] = p[t + ".running_var"]

    def cbr(dst_p, dst_s, tconv, tbn):
        dst_p["conv"]["kernel"] = conv_kernel(p[tconv + ".weight"])
        bn(dst_p["bn"], dst_s["bn"], tbn)

    def basic_block(dst_p, dst_s, pre):
        cbr(dst_p["conv1"], dst_s["conv1"], pre + ".conv1", pre + ".bn1")
        cbr(dst_p["conv2"], dst_s["conv2"], pre + ".conv2", pre + ".bn2")

    def tree(dst_p, dst_s, pre):
        if pre + ".conv1.weight" in p:
            basic_block(dst_p, dst_s, pre)
            return
        if pre + ".project.0.weight" in p:
            cbr(dst_p["project"], dst_s["project"],
                pre + ".project.0", pre + ".project.1")
        if pre + ".root.conv.weight" in p:
            cbr(dst_p["root"]["conv"], dst_s["root"]["conv"],
                pre + ".root.conv", pre + ".root.bn")
        tree(dst_p["tree1"], dst_s["tree1"], pre + ".tree1")
        tree(dst_p["tree2"], dst_s["tree2"], pre + ".tree2")

    bbp, bbs = pr["backbone"], st["backbone"]
    base_p, base_s = bbp["base"], bbs["base"]
    cbr(base_p["base_layer"], base_s["base_layer"],
        "base.base_layer.0", "base.base_layer.1")
    cbr(base_p["level0"], base_s["level0"], "base.level0.0", "base.level0.1")
    cbr(base_p["level1"], base_s["level1"], "base.level1.0", "base.level1.1")
    for lv in range(2, 6):
        tree(base_p[f"level{lv}"], base_s[f"level{lv}"], f"base.level{lv}")

    i = 0
    while any(k.startswith(f"dla_up.ida_{i}.") for k in p):
        dst_p = bbp["dla_up"][f"ida_{i}"]
        dst_s = bbs["dla_up"][f"ida_{i}"]
        pre = f"dla_up.ida_{i}"
        j = 0
        while (f"{pre}.proj_{j}.0.weight" in p
               or f"{pre}.up_{j}.weight" in p
               or f"{pre}.node_{j}.0.weight" in p or j == 0):
            if f"{pre}.proj_{j}.0.weight" in p:
                cbr(dst_p[f"proj_{j}"], dst_s[f"proj_{j}"],
                    f"{pre}.proj_{j}.0", f"{pre}.proj_{j}.1")
            if f"{pre}.up_{j}.weight" in p:
                # grouped ConvTranspose2d weight [C, 1, k, k] -> [k, k, C]
                dst_p[f"up_{j}"]["kernel"] = np.transpose(
                    p[f"{pre}.up_{j}.weight"][:, 0], (1, 2, 0))
            if f"{pre}.node_{j}.0.weight" in p:
                cbr(dst_p[f"node_{j}"], dst_s[f"node_{j}"],
                    f"{pre}.node_{j}.0", f"{pre}.node_{j}.1")
            j += 1
            if j > 16:
                break
        i += 1

    heads = sorted({k.split(".")[0] for k in p
                    if k.endswith(".0.weight")
                    and k.split(".")[0] + "_conv1" in bbp})
    for head in heads:
        bbp[f"{head}_conv1"]["kernel"] = conv_kernel(p[head + ".0.weight"])
        bbp[f"{head}_conv1"]["bias"] = p[head + ".0.bias"]
        bbp[f"{head}_out"]["kernel"] = conv_kernel(p[head + ".2.weight"])
        bbp[f"{head}_out"]["bias"] = p[head + ".2.bias"]

    _warn_unused(p, "import_docxlayout")
    return jax.tree.map(jnp.asarray,
                        _validate_shapes(variables, out, "import_docxlayout"))


def import_vlpt(sd: Dict[str, np.ndarray], variables: Dict,
                prefix: str = "") -> Dict:
    """Map a released VLPT-STD checkpoint (reference models/VLPT.py:29 +
    models/encoders.py) onto our VLPT variables ({"params","batch_stats"}).
    Covers: torchvision ResNet50 trunk, FPN laterals, stride-2 proj,
    cls/pos, pre-norm blocks (separate q/k/v), BertEmbeddings, cross
    blocks, token-type table, CLIP projections + logit scales, and the
    MLM head (decoder is tied to the word embeddings and not stored)."""
    out = jax.tree.map(np.asarray, variables)
    pr, st = out["params"], out.get("batch_stats", {})
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        if t + ".bias" in p:
            dst["bias"] = p[t + ".bias"]

    def ln(dst, t):
        dst["scale"] = p[t + ".weight"]
        dst["bias"] = p[t + ".bias"]

    def bn(dst_p, dst_s, t):
        dst_p["scale"] = p[t + ".weight"]
        dst_p["bias"] = p[t + ".bias"]
        dst_s["mean"] = p[t + ".running_mean"]
        dst_s["var"] = p[t + ".running_var"]

    def attn(dst, t):
        for n in ("q_proj", "k_proj", "v_proj", "proj"):
            lin(dst[n], f"{t}.{n}")

    def block(dst, t):
        ln(dst["norm1"], t + ".norm1")
        attn(dst["attn"], t + ".attn")
        ln(dst["norm2"], t + ".norm2")
        lin(dst["mlp"]["fc1"], t + ".mlp.fc1")
        lin(dst["mlp"]["fc2"], t + ".mlp.fc2")

    # ---- image encoder ----
    ie_p, ie_s = pr["image_encoder"], st["image_encoder"]
    bb_p, bb_s = ie_p["backbone"], ie_s["backbone"]
    pre = "image_encoder.backbone."
    bb_p["conv1"]["kernel"] = conv_kernel(p[pre + "conv1.weight"])
    bn(bb_p["bn1"], bb_s["bn1"], pre + "bn1")
    for li in range(1, 5):
        b = 0
        while f"{pre}layer{li}.{b}.conv1.weight" in p:
            dst_p = bb_p[f"layer{li}_{b}"]
            dst_s = bb_s[f"layer{li}_{b}"]
            t = f"{pre}layer{li}.{b}"
            for ci in (1, 2, 3):
                dst_p[f"conv{ci}"]["kernel"] = conv_kernel(
                    p[f"{t}.conv{ci}.weight"])
                bn(dst_p[f"bn{ci}"], dst_s[f"bn{ci}"], f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in p:
                dst_p["downsample_conv"]["kernel"] = conv_kernel(
                    p[f"{t}.downsample.0.weight"])
                bn(dst_p["downsample_bn"], dst_s["downsample_bn"],
                   f"{t}.downsample.1")
            b += 1
    for i in range(4):
        ie_p["fpn"][f"fpn_in_{i}"]["kernel"] = conv_kernel(
            p[f"image_encoder.fpn.fpn_in.{i}.weight"])
    ie_p["proj"]["kernel"] = conv_kernel(p["image_encoder.proj.0.weight"])
    ie_p["proj"]["bias"] = p["image_encoder.proj.0.bias"]
    ie_p["cls_token"] = p["image_encoder.cls_token"]
    ie_p["pos_embed"] = p["image_encoder.pos_embed"]
    i = 0
    while f"image_encoder.blocks.{i}.norm1.weight" in p:
        block(ie_p[f"block_{i}"], f"image_encoder.blocks.{i}")
        i += 1
    ln(ie_p["norm"], "image_encoder.norm")

    # ---- text encoder (BertEmbeddings live under text_embeddings) ----
    te = pr["text_encoder"]
    emb = "text_encoder.text_embeddings."
    pr["word_embeddings"]["embedding"] = p[emb + "word_embeddings.weight"]
    want = te["position_embeddings"]["embedding"].shape[0]
    te["position_embeddings"]["embedding"] = \
        p[emb + "position_embeddings.weight"][:want]
    te["token_type_embeddings"]["embedding"] = \
        p[emb + "token_type_embeddings.weight"]
    ln(te["emb_norm"], emb + "LayerNorm")
    i = 0
    while f"text_encoder.blocks.{i}.norm1.weight" in p:
        block(te[f"block_{i}"], f"text_encoder.blocks.{i}")
        i += 1
    ln(te["norm"], "text_encoder.norm")

    # ---- co encoder ----
    i = 0
    while f"co_encoder.blocks.{i}.norm1.weight" in p:
        dst = pr[f"co_block_{i}"]
        t = f"co_encoder.blocks.{i}"
        ln(dst["norm1"], t + ".norm1")
        ln(dst["norm2"], t + ".norm2")
        ln(dst["norm3"], t + ".norm3")
        attn(dst["self_attn"], t + ".self_attn")
        attn(dst["cross_attn"], t + ".cross_attn")
        lin(dst["mlp"]["fc1"], t + ".mlp.fc1")
        lin(dst["mlp"]["fc2"], t + ".mlp.fc2")
        i += 1
    ln(pr["co_norm"], "co_encoder.norm")

    # ---- top-level heads ----
    pr["token_type"]["embedding"] = p["token_type_embeddings.weight"]
    for ours, theirs in (("image_proj", "image_proj"),
                         ("text_proj", "text_proj"),
                         ("image_proj_wip", "image_proj_wip"),
                         ("text_proj_wip", "text_proj_wip")):
        lin(pr[ours], theirs)
    pr["logit_scale"] = p["logit_scale"].reshape(())
    pr["logit_scale_wip"] = p["logit_scale_wip"].reshape(())
    lin(pr["mlm_dense"], "mlm_score.transform.dense")
    ln(pr["mlm_norm"], "mlm_score.transform.LayerNorm")
    pr["mlm_bias"] = p["mlm_score.bias"]
    if "mlm_score.decoder.weight" in p:
        _ = p["mlm_score.decoder.weight"]     # tied to word embeddings

    _warn_unused(p, "import_vlpt")
    res = {"params": _validate_shapes(variables["params"], pr, "import_vlpt")}
    if st:
        res["batch_stats"] = st
    return jax.tree.map(jnp.asarray, res)


def import_gem_markuplm(sd: Dict[str, np.ndarray], variables: Dict,
                        prefix: str = "markuplm.") -> Dict:
    """Map a MarkupLM-base / GEM released encoder onto GEMEncoder params
    (reference GEM fine-tunes MarkupLM — README.md:13-18; HF MarkupLM key
    layout: embeddings.{word,position,token_type}_embeddings + LayerNorm,
    embeddings.xpath_embeddings.{xpath_tag_sub_embeddings.N,
    xpath_subs_sub_embeddings.N, xpath_unitseq2_inner, inner2emb},
    encoder.layer.N.attention.self.{query,key,value} /
    attention.output.{dense,LayerNorm} / intermediate.dense /
    output.{dense,LayerNorm}). Per-depth xpath tables stack into our
    [depth*vocab, unit] embedding. GEM's gestalt bbox projection has no
    MarkupLM counterpart and is left at init unless `bbox_proj.*` keys are
    present. The trailing classifier/qa head is task-specific and not
    imported here."""
    pr = jax.tree.map(np.asarray, variables["params"])
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        dst["bias"] = p[t + ".bias"]

    def ln(dst, t):
        dst["scale"] = p[t + ".weight"]
        dst["bias"] = p[t + ".bias"]

    emb = "embeddings."
    pr["word_embeddings"]["embedding"] = p[emb + "word_embeddings.weight"]
    pos = p[emb + "position_embeddings.weight"]
    want = pr["position_embeddings"]["embedding"].shape[0]
    pr["position_embeddings"]["embedding"] = pos[:want]
    pr["token_type_embeddings"]["embedding"] = \
        p[emb + "token_type_embeddings.weight"]
    ln(pr["emb_norm"], emb + "LayerNorm")

    xp = emb + "xpath_embeddings."
    depth = 0
    while f"{xp}xpath_tag_sub_embeddings.{depth}.weight" in p:
        depth += 1
    tags = np.concatenate(
        [p[f"{xp}xpath_tag_sub_embeddings.{d}.weight"] for d in range(depth)],
        axis=0)
    subs = np.concatenate(
        [p[f"{xp}xpath_subs_sub_embeddings.{d}.weight"] for d in range(depth)],
        axis=0)
    pr["xpath"]["tag_emb"]["embedding"] = tags
    pr["xpath"]["subs_emb"]["embedding"] = subs
    lin(pr["xpath"]["proj1"], xp + "xpath_unitseq2_inner")
    lin(pr["xpath"]["proj2"], xp + "inner2emb")

    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in p:
        dst = pr[f"layer_{i}"]
        pre = f"encoder.layer.{i}."
        lin(dst["q"], pre + "attention.self.query")
        lin(dst["k"], pre + "attention.self.key")
        lin(dst["v"], pre + "attention.self.value")
        lin(dst["out"], pre + "attention.output.dense")
        ln(dst["norm1"], pre + "attention.output.LayerNorm")
        lin(dst["ff1"], pre + "intermediate.dense")
        lin(dst["ff2"], pre + "output.dense")
        ln(dst["norm2"], pre + "output.LayerNorm")
        i += 1

    if "bbox_proj.weight" in p and "bbox_proj" in pr:
        lin(pr["bbox_proj"], "bbox_proj")

    _warn_unused(p, "import_gem_markuplm")
    return {"params": jax.tree.map(
        jnp.asarray,
        _validate_shapes(variables["params"], pr, "import_gem_markuplm"))}


def import_webrpg_vae(sd: Dict[str, np.ndarray], variables: Dict,
                      prefix: str = "") -> Dict:
    """Map the released WebRPG element VAE (reference baselines_model/
    vae.py:35 VAE: dimension_reduction/encoder_input Sequentials,
    encoder/decoder stacks of [Linear, LayerNorm], enc_mu/enc_logvar,
    final_layer/final_layer2) onto ElementVAE variables ({"params"})."""
    pr = jax.tree.map(np.asarray, variables["params"])
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        dst["bias"] = p[t + ".bias"]

    def ln(dst, t):
        dst["scale"] = p[t + ".weight"]
        dst["bias"] = p[t + ".bias"]

    lin(pr["dimension_reduction"], "dimension_reduction.0")
    lin(pr["encoder_input"], "encoder_input.0")
    i = 0
    while f"encoder.{i}.0.weight" in p:
        lin(pr[f"enc_stack_{i}"], f"encoder.{i}.0")
        ln(pr[f"enc_norms_{i}"], f"encoder.{i}.1")
        i += 1
    lin(pr["enc_mu"], "enc_mu")
    lin(pr["enc_logvar"], "enc_logvar")
    if "dec_stack_0" in pr:
        i = 0
        while f"decoder.{i}.0.weight" in p:
            lin(pr[f"dec_stack_{i}"], f"decoder.{i}.0")
            ln(pr[f"dec_norms_{i}"], f"decoder.{i}.1")
            i += 1
        lin(pr["final_layer"], "final_layer.0")
        lin(pr["final_layer2"], "final_layer2")
    else:
        # encoder-only consumer (FIDWebModel never decodes) — consume the
        # decoder tensors deliberately
        for k in list(p):
            if k.startswith(("decoder.", "final_layer")):
                _ = p[k]

    _warn_unused(p, "import_webrpg_vae")
    return {"params": jax.tree.map(
        jnp.asarray,
        _validate_shapes(variables["params"], pr, "import_webrpg_vae"))}


def import_abinet_vision(sd: Dict[str, np.ndarray], variables: Dict,
                         prefix: str = "vision.") -> Dict:
    """Map LevOCR's BaseVision (reference OCR/LevOCR/abinet: resnet.py:50
    ResNet45, backbone.py:13 ResTranformer, model_vision.py:23
    PositionAttention, :75 BaseVision) onto our ABINetVision variables
    ({"params", "batch_stats"} — ResNet/U-Net carry BatchNorm stats).
    Positional encodings are fixed sincos buffers on both sides and are
    not imported."""
    out = jax.tree.map(np.asarray, variables)
    pr, st = out["params"], out["batch_stats"]
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    def bn(dst_p, dst_s, t):
        dst_p["scale"] = p[t + ".weight"]
        dst_p["bias"] = p[t + ".bias"]
        dst_s["mean"] = p[t + ".running_mean"]
        dst_s["var"] = p[t + ".running_var"]

    def cbr(dst_p, dst_s, tconv, tbn):
        dst_p["conv"]["kernel"] = conv_kernel(p[tconv + ".weight"])
        bn(dst_p["bn"], dst_s["bn"], tbn)

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        dst["bias"] = p[t + ".bias"]

    rn_p, rn_s = pr["resnet"], st["resnet"]
    cbr(rn_p["stem"], rn_s["stem"], "backbone.resnet.conv1",
        "backbone.resnet.bn1")
    for s in range(5):
        b = 0
        while f"backbone.resnet.layer{s + 1}.{b}.conv1.weight" in p:
            pre = f"backbone.resnet.layer{s + 1}.{b}."
            dst_p = rn_p[f"layer{s}_block{b}"]
            dst_s = rn_s[f"layer{s}_block{b}"]
            cbr(dst_p["conv1"], dst_s["conv1"], pre + "conv1", pre + "bn1")
            cbr(dst_p["conv2"], dst_s["conv2"], pre + "conv2", pre + "bn2")
            if pre + "downsample.0.weight" in p:
                cbr(dst_p["downsample"], dst_s["downsample"],
                    pre + "downsample.0", pre + "downsample.1")
            b += 1

    i = 0
    while f"backbone.transformer.layers.{i}.self_attn.in_proj_weight" in p:
        pre = f"backbone.transformer.layers.{i}."
        t = pr[f"tfm{i}"]
        t["qkv"]["kernel"] = linear_kernel(p[pre + "self_attn.in_proj_weight"])
        t["qkv"]["bias"] = p[pre + "self_attn.in_proj_bias"]
        lin(t["proj"], pre + "self_attn.out_proj")
        lin(t["ff1"], pre + "linear1")
        lin(t["ff2"], pre + "linear2")
        for n in ("norm1", "norm2"):
            t[n]["scale"] = p[pre + n + ".weight"]
            t[n]["bias"] = p[pre + n + ".bias"]
        i += 1

    at_p, at_s = pr["attention"], st["attention"]
    for j in range(4):
        # encoder_layer Sequential: [conv, bn, relu]
        cbr(at_p[f"k_enc{j}"], at_s[f"k_enc{j}"],
            f"attention.k_encoder.{j}.0", f"attention.k_encoder.{j}.1")
        # decoder_layer Sequential: [upsample, conv, bn, relu]
        cbr(at_p[f"k_dec{j}"], at_s[f"k_dec{j}"],
            f"attention.k_decoder.{j}.1", f"attention.k_decoder.{j}.2")
    lin(at_p["project"], "attention.project")
    lin(pr["cls"], "cls")

    return jax.tree.map(jnp.asarray,
                        _validate_shapes(variables, out, "import_abinet_vision"))


def _levt_layer(p: Dict[str, np.ndarray], dst: Dict, pre: str) -> None:
    """fairseq TransformerDecoderLayer (levt/transformer_layer.py; separate
    q/k/v projections, post-norm, cross-attn unused because encoder_out is
    always None — levenshtein_transformer.py:459) → PostNormSelfAttnLayer."""
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                         ("out", "out_proj")):
        dst[ours]["kernel"] = linear_kernel(p[f"{pre}self_attn.{theirs}.weight"])
        dst[ours]["bias"] = p[f"{pre}self_attn.{theirs}.bias"]
    dst["ff1"]["kernel"] = linear_kernel(p[pre + "fc1.weight"])
    dst["ff1"]["bias"] = p[pre + "fc1.bias"]
    dst["ff2"]["kernel"] = linear_kernel(p[pre + "fc2.weight"])
    dst["ff2"]["bias"] = p[pre + "fc2.bias"]
    dst["norm1"]["scale"] = p[pre + "self_attn_layer_norm.weight"]
    dst["norm1"]["bias"] = p[pre + "self_attn_layer_norm.bias"]
    dst["norm2"]["scale"] = p[pre + "final_layer_norm.weight"]
    dst["norm2"]["bias"] = p[pre + "final_layer_norm.bias"]


def import_levt(sd: Dict[str, np.ndarray], params: Dict,
                prefix: str = "levt.") -> Dict:
    """Map the LevT side of a LevOCR checkpoint
    (levenshtein_transformer.py:387 encoder = BERT-embedded text stack,
    :523 decoder = multimodal fusion stack + tied heads) onto our
    text_encoder/decoder param trees. Position tables longer than our
    max_len are sliced; the constant text token-type row of the encoder's
    BertEmbeddings is folded into the position table."""
    out = jax.tree.map(np.asarray, params)
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    te = out["text_encoder"]
    emb = "encoder.text_embeddings."
    te["word_emb"]["embedding"] = p[emb + "word_embeddings.weight"]
    L = te["pos_emb"]["embedding"].shape[0]
    te["pos_emb"]["embedding"] = (
        p[emb + "position_embeddings.weight"][:L]
        + p[emb + "token_type_embeddings.weight"][0][None])
    te["emb_ln"]["scale"] = p[emb + "LayerNorm.weight"]
    te["emb_ln"]["bias"] = p[emb + "LayerNorm.bias"]
    i = 0
    while f"encoder.layers.{i}.fc1.weight" in p:
        _levt_layer(p, te[f"layer_{i}"], f"encoder.layers.{i}.")
        i += 1

    de = out["decoder"]
    # fairseq LevT ties decoder input/output embeddings: output_projection
    # .weight IS embed_tokens.weight (levenshtein_transformer.py:122,:436),
    # so the state dict carries both names for one tensor — consume both
    # and verify the tie rather than silently skipping embed_tokens.
    de["word_emb_out"]["embedding"] = p["decoder.output_projection.weight"]
    if "decoder.embed_tokens.weight" in p:
        tied = p["decoder.embed_tokens.weight"]
        if not np.array_equal(tied, de["word_emb_out"]["embedding"]):
            raise ValueError(
                "import_levt: decoder.embed_tokens.weight differs from "
                "decoder.output_projection.weight — the reference always "
                "ties them (share_decoder_input_output_embed)")
    de["mask_ins_emb"]["embedding"] = p["decoder.embed_mask_ins.weight"]
    de["word_del_emb"]["embedding"] = p["decoder.embed_word_del.weight"]
    de["type_emb"]["embedding"] = p["decoder.token_type_embeddings.weight"]
    de["img_proj"]["kernel"] = linear_kernel(p["decoder.img_embed_dim.weight"])
    Lt = de["text_pos"].shape[1]
    de["text_pos"] = p["decoder.text_pos_emb"][:, :Lt]
    Li = de["img_pos"].shape[1]
    de["img_pos"] = p["decoder.img_pos_emb"][:, :Li]
    i = 0
    while f"decoder.layers.{i}.fc1.weight" in p:
        _levt_layer(p, de[f"layer_{i}"], f"decoder.layers.{i}.")
        i += 1

    _warn_unused(p, "import_levt")
    return jax.tree.map(jnp.asarray, _validate_shapes(params, out, "import_levt"))


def import_levocr(sd: Dict[str, np.ndarray], variables: Dict) -> Dict:
    """Full LevOCR checkpoint (models.py:145 LevOCRModel: vision BaseVision,
    conv4_1/bn4_1 + conv4_2/bn4_2 image-token reduction, levt): composes
    import_abinet_vision + the reduction convs + import_levt over the full
    flax variables ({"params", "batch_stats"})."""
    out = jax.tree.map(np.asarray, variables)
    pr, st = out["params"], out["batch_stats"]
    p = dict(sd)

    vis = import_abinet_vision(sd, {"params": pr["vision"],
                                    "batch_stats": st["vision"]})
    pr["vision"], st["vision"] = vis["params"], vis["batch_stats"]

    for ours, tconv, tbn in (("img_conv1", "conv4_1", "bn4_1"),
                             ("img_conv2", "conv4_2", "bn4_2")):
        pr[ours]["conv"]["kernel"] = conv_kernel(p[tconv + ".weight"])
        pr[ours]["bn"]["scale"] = p[tbn + ".weight"]
        pr[ours]["bn"]["bias"] = p[tbn + ".bias"]
        st[ours]["bn"]["mean"] = p[tbn + ".running_mean"]
        st[ours]["bn"]["var"] = p[tbn + ".running_var"]

    lev = import_levt(sd, {"text_encoder": pr["text_encoder"],
                           "decoder": pr["decoder"]})
    pr["text_encoder"], pr["decoder"] = lev["text_encoder"], lev["decoder"]

    return jax.tree.map(jnp.asarray, _validate_shapes(variables, out, "import_levocr"))


def import_geolayoutlm_backbone(sd: Dict[str, np.ndarray], params: Dict,
                                prefix: str = "geolayoutlm_model.") -> Dict:
    """Map a GeoLayoutLM backbone checkpoint (modeling_bros_convnext.py:29
    GeoLayoutLMModel: BrosModel text encoder with crel attention +
    concatenated spatial embeddings, ConvNeXt+FPN VisionModel, the shared
    vis_linear, and the two cross-modal TransformerDecoder layers) onto our
    GeoLayoutLM params. The reference releases the backbone as its own
    state dict (geolayoutlm_vie.py:87), which is what this covers; the
    VIE heads are fine-tune-specific."""
    out = jax.tree.map(np.asarray, params)
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        if "bias" in dst and t + ".bias" in p:
            dst["bias"] = p[t + ".bias"]

    def ln(dst, t):
        dst["scale"] = p[t + ".weight"]
        dst["bias"] = p[t + ".bias"]

    # ---- text encoder (modeling_bros.py BrosModel) ----
    te = out["text_encoder"]
    ep = "text_encoder.embeddings."
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings", "x_position_embeddings",
                 "y_position_embeddings", "h_position_embeddings",
                 "w_position_embeddings", "line_rank_embeddings",
                 "line_rank_inner_embeddings"):
        if ep + name + ".weight" in p and name in te:
            te[name]["embedding"] = p[ep + name + ".weight"]
    ln(te["emb_norm"], ep + "LayerNorm")
    te["bbox_projection"]["kernel"] = linear_kernel(
        p[ep + "bbox_projection.weight"])
    i = 0
    while f"text_encoder.encoder.layer.{i}.attention.self.query.weight" in p:
        pre = f"text_encoder.encoder.layer.{i}."
        L = te[f"layer_{i}"]
        for n in ("query", "key", "value"):
            lin(L["attn"][n], pre + "attention.self." + n)
        lin(L["attn_out"], pre + "attention.output.dense")
        ln(L["attn_norm"], pre + "attention.output.LayerNorm")
        lin(L["ffn1"], pre + "intermediate.dense")
        lin(L["ffn2"], pre + "output.dense")
        ln(L["ffn_norm"], pre + "output.LayerNorm")
        i += 1
    if "pooler" in te and "text_encoder.pooler.dense.weight" in p:
        lin(te["pooler"], "text_encoder.pooler.dense")

    # ---- visual encoder (vision_model.py ConvNeXt + FPN) ----
    vis = out["visual_encoder"]
    cnn = vis["cnn"]
    cp = "visual_encoder.cnn."
    cnn["stem"]["kernel"] = conv_kernel(p[cp + "downsample_layers.0.0.weight"])
    cnn["stem"]["bias"] = p[cp + "downsample_layers.0.0.bias"]
    ln(cnn["stem_norm"], cp + "downsample_layers.0.1")
    for s in range(1, 4):
        ln(cnn[f"ds_norm{s}"], cp + f"downsample_layers.{s}.0")
        cnn[f"ds_conv{s}"]["kernel"] = conv_kernel(
            p[cp + f"downsample_layers.{s}.1.weight"])
        cnn[f"ds_conv{s}"]["bias"] = p[cp + f"downsample_layers.{s}.1.bias"]
    for s in range(4):
        b = 0
        while f"stage{s}_block{b}" in cnn:
            pre = cp + f"stages.{s}.{b}."
            blk = cnn[f"stage{s}_block{b}"]
            blk["dwconv"]["kernel"] = conv_kernel(p[pre + "dwconv.weight"])
            blk["dwconv"]["bias"] = p[pre + "dwconv.bias"]
            ln(blk["norm"], pre + "norm")
            lin(blk["pwconv1"], pre + "pwconv1")
            lin(blk["pwconv2"], pre + "pwconv2")
            blk["gamma"] = p[pre + "gamma"]
            b += 1
    for n in ("in5", "in4", "in3", "in2"):
        vis[n]["kernel"] = conv_kernel(p[f"visual_encoder.{n}.weight"])
    for n in ("out5", "out4", "out3"):   # Sequential(conv, upsample)
        vis[n]["kernel"] = conv_kernel(p[f"visual_encoder.{n}.0.weight"])
    vis["out2"]["kernel"] = conv_kernel(p["visual_encoder.out2.weight"])
    # pos_emb1 torch [C, h, w] → ours [1, h, w, C]
    vis["pos_emb1"] = np.transpose(p["visual_encoder.pos_emb1"], (1, 2, 0))[None]
    vis["aggr"]["kernel"] = conv_kernel(p["visual_encoder.aggr.weight"])
    vis["aggr"]["bias"] = p["visual_encoder.aggr.bias"]

    # torch shares one vis_linear for block and full-image features
    lin(out["vis_linear"], "vis_linear")
    if "vis_linear_full" in out:
        lin(out["vis_linear_full"], "vis_linear")

    # ---- cross-modal decoders (transformer_local.py, 1 layer each) ----
    for name in ("cross_modal_text", "cross_modal_visual"):
        cm = out[name]
        pre = f"{name}.layers.0."
        D = p[pre + "self_attn.in_proj_weight"].shape[1]
        for attn, t in (("sa", "self_attn"), ("ca", "multihead_attn")):
            w = p[pre + t + ".in_proj_weight"]
            b3 = p[pre + t + ".in_proj_bias"]
            for j, which in enumerate(("q", "k", "v")):
                cm[f"{attn}_{which}"]["kernel"] = linear_kernel(
                    w[j * D:(j + 1) * D])
                cm[f"{attn}_{which}"]["bias"] = b3[j * D:(j + 1) * D]
            lin(cm[f"{attn}_out"], pre + t + ".out_proj")
        lin(cm["ff1"], pre + "linear1")
        lin(cm["ff2"], pre + "linear2")
        for n in ("norm1", "norm2", "norm3"):
            ln(cm[n], pre + n)

    _warn_unused(p, "import_geolayoutlm_backbone")
    return jax.tree.map(jnp.asarray,
                        _validate_shapes(params, out, "import_geolayoutlm_backbone"))


def import_geolayoutlm_vie(sd: Dict[str, np.ndarray], params: Dict) -> Dict:
    """Full GeoLayoutLM VIE checkpoint (geolayoutlm_vie.py:22): backbone +
    bio_classifier + PairGeometricHead bilinear + MultiPairsGeometricHead
    (rel_layer, stock-encoder trenc, local-decoder trdec, fc). The BIO head's
    inner-id table is the text encoder's line_rank_inner_embeddings in the
    reference (geolayoutlm_vie.py:136); we copy it into our separate
    bio_inner_embeddings (identical at inference)."""
    out = import_geolayoutlm_backbone(sd, params)
    out = jax.tree.map(np.asarray, out)
    p = _TrackingDict({k: v for k, v in sd.items()
                       if not k.startswith("geolayoutlm_model.")})

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        if "bias" in dst and t + ".bias" in p:
            dst["bias"] = p[t + ".bias"]

    lin(out["bio_classifier"], "bio_classifier")
    inner = "geolayoutlm_model.text_encoder.embeddings." \
            "line_rank_inner_embeddings.weight"
    if "bio_inner_embeddings" in out and inner in sd:
        out["bio_inner_embeddings"]["embedding"] = np.asarray(sd[inner])

    out["pair_bilinear"] = p["pair_geometric_head.bilinear.weight"][0]
    out["pair_bias"] = np.asarray(p["pair_geometric_head.bilinear.bias"])[0]

    mp = "multi_pairs_geometric_head."
    lin(out["rel_layer"], mp + "rel_layer")
    lin(out["mp_fc"], mp + "fc")
    # trenc: stock nn.TransformerEncoderLayer (packed in_proj)
    enc = out["mp_enc"]
    D = p[mp + "trenc.layers.0.self_attn.in_proj_weight"].shape[1]
    w = p[mp + "trenc.layers.0.self_attn.in_proj_weight"]
    b3 = p[mp + "trenc.layers.0.self_attn.in_proj_bias"]
    for j, which in enumerate(("q", "k", "v")):
        enc[f"sa_{which}"]["kernel"] = linear_kernel(w[j * D:(j + 1) * D])
        enc[f"sa_{which}"]["bias"] = b3[j * D:(j + 1) * D]
    lin(enc["sa_out"], mp + "trenc.layers.0.self_attn.out_proj")
    lin(enc["ff1"], mp + "trenc.layers.0.linear1")
    lin(enc["ff2"], mp + "trenc.layers.0.linear2")
    for n in ("norm1", "norm2"):
        enc[n]["scale"] = p[mp + f"trenc.layers.0.{n}.weight"]
        enc[n]["bias"] = p[mp + f"trenc.layers.0.{n}.bias"]
    # trdec: local TransformerDecoderLayer, self_attn=False (cross + ffn)
    dec = out["mp_dec"]
    w = p[mp + "trdec.layers.0.multihead_attn.in_proj_weight"]
    b3 = p[mp + "trdec.layers.0.multihead_attn.in_proj_bias"]
    for j, which in enumerate(("q", "k", "v")):
        dec[f"ca_{which}"]["kernel"] = linear_kernel(w[j * D:(j + 1) * D])
        dec[f"ca_{which}"]["bias"] = b3[j * D:(j + 1) * D]
    lin(dec["ca_out"], mp + "trdec.layers.0.multihead_attn.out_proj")
    lin(dec["ff1"], mp + "trdec.layers.0.linear1")
    lin(dec["ff2"], mp + "trdec.layers.0.linear2")
    for ours, theirs in (("norm2", "norm2"), ("norm3", "norm3")):
        dec[ours]["scale"] = p[mp + f"trdec.layers.0.{theirs}.weight"]
        dec[ours]["bias"] = p[mp + f"trdec.layers.0.{theirs}.bias"]

    _warn_unused(p, "import_geolayoutlm_vie")
    return jax.tree.map(jnp.asarray,
                        _validate_shapes(params, out, "import_geolayoutlm_vie"))


def _lore_tsfm(p: "_TrackingDict", dst: Dict, pre: str) -> None:
    """Map one vendored-transformer (LORE-TSR transformer.py:48) onto our
    LoreTransformer subtree: linear → layers.{i}.{norm_1,attn,norm_2,ff} →
    decoder.linear.{0,2}. The reference Encoder's `norm` and `pe` members
    are dead code (never applied in forward) and are skipped."""
    dst["in_proj"]["kernel"] = linear_kernel(p[pre + "linear.weight"])
    dst["in_proj"]["bias"] = p[pre + "linear.bias"]
    i = 0
    while f"layer_{i}" in dst:
        lay = dst[f"layer_{i}"]
        lp = pre + f"encoder.layers.{i}."
        for n in ("1", "2"):
            lay[f"norm{n}_alpha"] = p[lp + f"norm_{n}.alpha"]
            lay[f"norm{n}_bias"] = p[lp + f"norm_{n}.bias"]
        for ours, theirs in (("q", "q_linear"), ("k", "k_linear"),
                             ("v", "v_linear"), ("out", "out")):
            lay[ours]["kernel"] = linear_kernel(p[lp + f"attn.{theirs}.weight"])
            lay[ours]["bias"] = p[lp + f"attn.{theirs}.bias"]
        lay["ff1"]["kernel"] = linear_kernel(p[lp + "ff.linear_1.weight"])
        lay["ff1"]["bias"] = p[lp + "ff.linear_1.bias"]
        lay["ff2"]["kernel"] = linear_kernel(p[lp + "ff.linear_2.weight"])
        lay["ff2"]["bias"] = p[lp + "ff.linear_2.bias"]
        i += 1
    # dead members: consumed so _warn_unused stays quiet
    for dead in ("encoder.norm.alpha", "encoder.norm.bias"):
        if pre + dead in p:
            pass
    dst["dec1"]["kernel"] = linear_kernel(p[pre + "decoder.linear.0.weight"])
    dst["dec1"]["bias"] = p[pre + "decoder.linear.0.bias"]
    dst["dec2"]["kernel"] = linear_kernel(p[pre + "decoder.linear.2.weight"])
    dst["dec2"]["bias"] = p[pre + "decoder.linear.2.bias"]


def import_lore_processor(sd: Dict[str, np.ndarray], params: Dict,
                          prefix: str = "") -> Dict:
    """LORE logical `Processor` checkpoint (the second model file the
    reference loads, base_detector.py:29-30 `load_model(Processor(opt),
    opt.load_processor)`; module defined at classifier.py:51) → our
    LoreProcessor param tree.

    Covers: x/y position embeddings, the `tsfm_axis` regressor, and (when
    wiz_stacking) the Stacker's logi_encoder (classifier.py:25-29) +
    stacked transformer."""
    out = jax.tree.map(np.asarray, params)
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    out["x_pe"]["embedding"] = p["x_position_embeddings.weight"]
    out["y_pe"]["embedding"] = p["y_position_embeddings.weight"]
    _lore_tsfm(p, out["tsfm_axis"], "tsfm_axis.")
    if "stacker_tsfm" in out:
        out["logi_enc1"]["kernel"] = linear_kernel(
            p["stacker.logi_encoder.0.weight"])
        out["logi_enc1"]["bias"] = p["stacker.logi_encoder.0.bias"]
        out["logi_enc2"]["kernel"] = linear_kernel(
            p["stacker.logi_encoder.2.weight"])
        out["logi_enc2"]["bias"] = p["stacker.logi_encoder.2.bias"]
        _lore_tsfm(p, out["stacker_tsfm"], "stacker.tsfm.")

    _warn_unused(p, "import_lore_processor")
    return jax.tree.map(jnp.asarray,
                        _validate_shapes(params, out, "import_lore_processor"))


def _bicubic_resize_torch(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bicubic resize matching torch F.interpolate(mode='bicubic',
    align_corners=False): Keys kernel with a = -0.75 (PIL/jax use -0.5),
    half-pixel centers, edge-clamped taps. x [H, W] → [out_h, out_w]."""
    a = -0.75

    def kernel(t):
        t = np.abs(t)
        return np.where(
            t <= 1, ((a + 2) * t - (a + 3)) * t * t + 1,
            np.where(t < 2, a * (((t - 5) * t + 8) * t - 4), 0.0))

    def axis_weights(n_in, n_out):
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        base = np.floor(src).astype(int)
        w = np.zeros((n_out, n_in))
        for k in range(-1, 3):
            idx = np.clip(base + k, 0, n_in - 1)
            w[np.arange(n_out), idx] += kernel(src - (base + k))
        return w

    wy = axis_weights(x.shape[0], out_h)
    wx = axis_weights(x.shape[1], out_w)
    return wy @ x @ wx.T


def interpolate_rel_pos_table(table: np.ndarray, src_window: Tuple[int, int],
                              dst_window: Tuple[int, int]) -> np.ndarray:
    """BEiT shared relative-position table [(2h−1)(2w−1)+3, H] resized to a
    new window with torch-bicubic, keeping the 3 cls slots
    (VGTbeit.py:509-522 RelativePositionBias.forward)."""
    sh, sw = src_window
    dh, dw = dst_window
    if (sh, sw) == (dh, dw):
        return table
    H = table.shape[1]
    body = table[:-3].reshape(2 * sh - 1, 2 * sw - 1, H)
    out = np.stack([
        _bicubic_resize_torch(body[:, :, h], 2 * dh - 1, 2 * dw - 1)
        for h in range(H)], axis=-1).reshape(-1, H)
    return np.concatenate([out, table[-3:]], axis=0).astype(table.dtype)


def _vgt_beit_block(p: "_TrackingDict", dst: Dict, pre: str) -> None:
    for n in ("norm1", "norm2"):
        dst[n]["scale"] = p[pre + f"{n}.weight"]
        dst[n]["bias"] = p[pre + f"{n}.bias"]
    at = dst["attn"]
    at["qkv"]["kernel"] = linear_kernel(p[pre + "attn.qkv.weight"])
    at["q_bias"] = p[pre + "attn.q_bias"]
    at["v_bias"] = p[pre + "attn.v_bias"]
    at["proj"]["kernel"] = linear_kernel(p[pre + "attn.proj.weight"])
    at["proj"]["bias"] = p[pre + "attn.proj.bias"]
    if pre + "attn.relative_position_bias_table" in p and \
            "relative_position_bias_table" in at:
        at["relative_position_bias_table"] = \
            p[pre + "attn.relative_position_bias_table"]
    dst["mlp"]["fc1"]["kernel"] = linear_kernel(p[pre + "mlp.fc1.weight"])
    dst["mlp"]["fc1"]["bias"] = p[pre + "mlp.fc1.bias"]
    dst["mlp"]["fc2"]["kernel"] = linear_kernel(p[pre + "mlp.fc2.weight"])
    dst["mlp"]["fc2"]["bias"] = p[pre + "mlp.fc2.bias"]
    if pre + "gamma_1" in p:
        dst["gamma_1"] = p[pre + "gamma_1"]
        dst["gamma_2"] = p[pre + "gamma_2"]


def _vgt_cross_attn(p: "_TrackingDict", dst: Dict, pre: str) -> None:
    dst["q"]["kernel"] = linear_kernel(p[pre + "q.weight"])
    dst["kv"]["kernel"] = linear_kernel(p[pre + "kv.weight"])
    dst["q_bias"] = p[pre + "q_bias"]
    dst["v_bias"] = p[pre + "v_bias"]
    dst["proj"]["kernel"] = linear_kernel(p[pre + "proj.weight"])
    dst["proj"]["bias"] = p[pre + "proj.bias"]


def _vgt_self_attn(p: "_TrackingDict", dst: Dict, pre: str) -> None:
    dst["qkv"]["kernel"] = linear_kernel(p[pre + "qkv.weight"])
    dst["q_bias"] = p[pre + "q_bias"]
    dst["v_bias"] = p[pre + "v_bias"]
    dst["proj"]["kernel"] = linear_kernel(p[pre + "proj.weight"])
    dst["proj"]["bias"] = p[pre + "proj.bias"]


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] → flax ConvTranspose
    [kh, kw, in, out], spatially flipped: lax.conv_transpose applies the
    kernel unflipped while torch's deconv is the gradient of a conv
    (verified exact on a stride-2 2x2 fixture)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def import_vgt(sd: Dict[str, np.ndarray], variables: Dict,
               checkpoint_window: Tuple[int, int] = (14, 14),
               window: Optional[Tuple[int, int]] = None,
               prefix: str = "") -> Dict:
    """Released VGT detectron2 checkpoint → our VGTBackbone variables
    (params + batch_stats — fpn1 contains a BatchNorm).

    Key layout (ditod/VGT.py:34 meta arch + VGTbackbone.py:191
    build_VGT_fpn_backbone): `Wordgrid_embedding.*`,
    `backbone.bottom_up.backbone.*` (the two-stream BEiT), and the
    detectron2 GridFPN convs `backbone.fpn_lateral{2..5}` /
    `backbone.fpn_output{2..5}`. The shared relative-position table is
    bicubic-interpolated (torch a=-0.75 kernel, VGTbeit.py:509) from
    `checkpoint_window` (14x14 for the 224/16 pretraining grid) to the
    model's configured window. Cascade R-CNN / RPN keys are skipped — the
    head here is the documented CenterNet divergence."""
    pr = jax.tree.map(np.asarray, variables["params"])
    st = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})
    bb = "backbone.bottom_up.backbone."

    pr["wordnn"]["embedding"]["embedding"] = p["Wordgrid_embedding.embedding.weight"]
    pr["wordnn"]["embedding_proj"]["kernel"] = linear_kernel(
        p["Wordgrid_embedding.embedding_proj.weight"])

    pr["cls_token"] = p[bb + "cls_token"]
    pr["grid_token"] = p[bb + "grid_token"]
    pr["patch_embed"]["kernel"] = conv_kernel(p[bb + "patch_embed.proj.weight"])
    pr["patch_embed"]["bias"] = p[bb + "patch_embed.proj.bias"]
    pr["grid_patch_embed"]["kernel"] = conv_kernel(
        p[bb + "grid_patch_embed.proj.weight"])
    pr["grid_patch_embed"]["bias"] = p[bb + "grid_patch_embed.proj.bias"]
    if bb + "pos_embed" in p and "pos_embed" in pr:
        pr["pos_embed"] = p[bb + "pos_embed"]
        pr["grid_pos_embed"] = p[bb + "grid_pos_embed"]

    if "rel_pos_bias" in pr:
        want = pr["rel_pos_bias"]["relative_position_bias_table"].shape[0]
        table = p[bb + "rel_pos_bias.relative_position_bias_table"]
        if table.shape[0] != want:
            if window is not None:
                dst_window = window
            else:
                # want = (2h-1)(2w-1)+3; solve assuming a square window
                # (pass `window=` explicitly for rectangular configs)
                n = int(round(((want - 3) ** 0.5)))
                dst_window = (n + 1) // 2, (n + 1) // 2
            table = interpolate_rel_pos_table(table, checkpoint_window,
                                              dst_window)
        pr["rel_pos_bias"]["relative_position_bias_table"] = table

    for stream, tpre in (("blocks", "blocks"), ("grid_blocks", "grid_blocks")):
        i = 0
        while f"{stream}_{i}" in pr:
            _vgt_beit_block(p, pr[f"{stream}_{i}"], bb + f"{tpre}.{i}.")
            i += 1

    i = 0
    while f"cross_blocks_{i}" in pr:
        dst = pr[f"cross_blocks_{i}"]
        cpre = bb + f"cross_blocks.{i}."
        for n in ("norm_vis", "norm_grid", "norm2_vis", "norm2_grid"):
            dst[n]["scale"] = p[cpre + f"{n}.weight"]
            dst[n]["bias"] = p[cpre + f"{n}.bias"]
        _vgt_cross_attn(p, dst["vis_attn"], cpre + "vis_attn.")
        _vgt_cross_attn(p, dst["grid_attn"], cpre + "grid_attn.")
        sb = dst["self_block"]
        for n in ("norm_vis", "norm_grid"):
            sb[n]["scale"] = p[cpre + f"self_block.{n}.weight"]
            sb[n]["bias"] = p[cpre + f"self_block.{n}.bias"]
        _vgt_self_attn(p, sb["vis_attn"], cpre + "self_block.vis_attn.")
        _vgt_self_attn(p, sb["grid_attn"], cpre + "self_block.grid_attn.")
        for mlp, tm in (("vis_mlp", "vis_mlp"), ("grid_mlp", "grid_mlp")):
            dst[mlp]["fc1"]["kernel"] = linear_kernel(p[cpre + f"{tm}.fc1.weight"])
            dst[mlp]["fc1"]["bias"] = p[cpre + f"{tm}.fc1.bias"]
            dst[mlp]["fc2"]["kernel"] = linear_kernel(p[cpre + f"{tm}.fc2.weight"])
            dst[mlp]["fc2"]["bias"] = p[cpre + f"{tm}.fc2.bias"]
        if cpre + "gamma_vis" in p:
            dst["gamma_vis"] = p[cpre + "gamma_vis"]
            dst["gamma_grid"] = p[cpre + "gamma_grid"]
            dst["gamma_1"] = p[cpre + "gamma_1"]
            dst["gamma_2"] = p[cpre + "gamma_2"]
            sb["gamma_vis"] = p[cpre + "self_block.gamma_vis"]
            sb["gamma_grid"] = p[cpre + "self_block.gamma_grid"]
        i += 1

    # per-stream fpn ops (Sequential indices: fpn1 = [deconv, BN, GELU,
    # deconv]; fpn2 = [deconv])
    for gpre in ("", "grid_"):
        pr[f"{gpre}fpn1_deconv1"]["kernel"] = _deconv_kernel(
            p[bb + f"{gpre}fpn1.0.weight"])
        pr[f"{gpre}fpn1_deconv1"]["bias"] = p[bb + f"{gpre}fpn1.0.bias"]
        pr[f"{gpre}fpn1_bn"]["scale"] = p[bb + f"{gpre}fpn1.1.weight"]
        pr[f"{gpre}fpn1_bn"]["bias"] = p[bb + f"{gpre}fpn1.1.bias"]
        st[f"{gpre}fpn1_bn"]["mean"] = p[bb + f"{gpre}fpn1.1.running_mean"]
        st[f"{gpre}fpn1_bn"]["var"] = p[bb + f"{gpre}fpn1.1.running_var"]
        pr[f"{gpre}fpn1_deconv2"]["kernel"] = _deconv_kernel(
            p[bb + f"{gpre}fpn1.3.weight"])
        pr[f"{gpre}fpn1_deconv2"]["bias"] = p[bb + f"{gpre}fpn1.3.bias"]
        pr[f"{gpre}fpn2_deconv"]["kernel"] = _deconv_kernel(
            p[bb + f"{gpre}fpn2.0.weight"])
        pr[f"{gpre}fpn2_deconv"]["bias"] = p[bb + f"{gpre}fpn2.0.bias"]

    # FeatureMerge (Concat only; Sum has no params)
    for i in range(4):
        if f"vis_proj_{i}" in pr:
            fm = "backbone.bottom_up.FeatureMerge."
            for ours, theirs in ((f"vis_proj_{i}", f"vis_proj.{i}"),
                                 (f"text_proj_{i}", f"text_proj.{i}"),
                                 (f"alpha_proj_{i}", f"alpha_proj.{i}")):
                pr[ours]["kernel"] = linear_kernel(p[fm + theirs + ".weight"])
                pr[ours]["bias"] = p[fm + theirs + ".bias"]

    # detectron2 GridFPN convs
    for i in range(2, 6):
        pr[f"fpn_lateral{i}"]["kernel"] = conv_kernel(
            p[f"backbone.fpn_lateral{i}.weight"])
        pr[f"fpn_lateral{i}"]["bias"] = p[f"backbone.fpn_lateral{i}.bias"]
        pr[f"fpn_output{i}"]["kernel"] = conv_kernel(
            p[f"backbone.fpn_output{i}.weight"])
        pr[f"fpn_output{i}"]["bias"] = p[f"backbone.fpn_output{i}.bias"]

    # Cascade/RPN heads are intentionally unmapped (documented divergence)
    for k in list(dict.keys(p)):
        if k.startswith(("roi_heads.", "proposal_generator.")):
            p.read.add(k)

    _warn_unused(p, "import_vgt")
    out = {"params": _validate_shapes(variables["params"], pr, "import_vgt")}
    if st:
        out["batch_stats"] = _validate_shapes(
            variables.get("batch_stats", {}), st, "import_vgt")
    return jax.tree.map(jnp.asarray, out)


def import_vgt_cascade(sd: Dict[str, np.ndarray], variables: Dict,
                       pooler_resolution: int = 7, **kw) -> Dict:
    """Full VGTCascadeDetector (backbone + RPN + 3-stage cascade) from a
    released VGT detectron2 checkpoint. Backbone via import_vgt; head keys:
    `proposal_generator.rpn_head.{conv,objectness_logits,anchor_deltas}`
    and `roi_heads.box_head.{i}.fc{1,2}` /
    `roi_heads.box_predictor.{i}.{cls_score,bbox_pred}` (detectron2
    CascadeROIHeads with FastRCNNConvFCHead + FastRCNNOutputLayers)."""
    pr = jax.tree.map(np.asarray, variables["params"])
    st = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    bb_vars = {"params": pr["backbone"]}
    if "backbone" in st:
        bb_vars["batch_stats"] = st["backbone"]
    imported_bb = import_vgt(sd, bb_vars, **kw)
    pr["backbone"] = jax.tree.map(np.asarray, imported_bb["params"])
    if "batch_stats" in imported_bb:
        st["backbone"] = jax.tree.map(np.asarray, imported_bb["batch_stats"])

    p = _TrackingDict(sd)
    roi = pr["roi"]
    rp = "proposal_generator.rpn_head."
    for ours, theirs in (("conv", "conv"),
                         ("objectness_logits", "objectness_logits"),
                         ("anchor_deltas", "anchor_deltas")):
        roi["rpn_head"][ours]["kernel"] = conv_kernel(p[rp + theirs + ".weight"])
        roi["rpn_head"][ours]["bias"] = p[rp + theirs + ".bias"]
    i = 0
    r = pooler_resolution
    while f"stage_{i}" in roi:
        dst = roi[f"stage_{i}"]
        # fc1 consumes the flattened pooled feature: torch flattens
        # channel-major [C, r, r], ours row-major [r, r, C] — permute the
        # input dimension of the weight accordingly
        w1 = p[f"roi_heads.box_head.{i}.fc1.weight"]       # [fc, C*r*r]
        fc = w1.shape[0]
        C = w1.shape[1] // (r * r)
        w1 = w1.reshape(fc, C, r, r).transpose(0, 2, 3, 1).reshape(fc, -1)
        dst["fc1"]["kernel"] = w1.T
        dst["fc1"]["bias"] = p[f"roi_heads.box_head.{i}.fc1.bias"]
        for ours, theirs in (("fc2", f"roi_heads.box_head.{i}.fc2"),
                             ("cls_score", f"roi_heads.box_predictor.{i}.cls_score"),
                             ("bbox_pred", f"roi_heads.box_predictor.{i}.bbox_pred")):
            dst[ours]["kernel"] = linear_kernel(p[theirs + ".weight"])
            dst[ours]["bias"] = p[theirs + ".bias"]
        i += 1

    out = {"params": _validate_shapes(variables["params"], pr,
                                      "import_vgt_cascade")}
    if st:
        out["batch_stats"] = st
    return jax.tree.map(jnp.asarray, out)


def _omni_decoder_layer(p: "_TrackingDict", dst: Dict, pre: str) -> None:
    """One DETR pre-norm decoder layer (reference model/transformer.py:380
    TransformerDecoderLayer): torch MultiheadAttention packs q|k|v rows in
    in_proj_weight [3D, D]."""
    for attn, ours in (("self_attn", "sa"), ("multihead_attn", "ca")):
        w = p[pre + f"{attn}.in_proj_weight"]
        b = p[pre + f"{attn}.in_proj_bias"]
        D = w.shape[1]
        for j, which in enumerate(("q", "k", "v")):
            dst[f"{ours}_{which}"]["kernel"] = linear_kernel(w[j * D:(j + 1) * D])
            dst[f"{ours}_{which}"]["bias"] = b[j * D:(j + 1) * D]
        dst[f"{ours}_out"]["kernel"] = linear_kernel(p[pre + f"{attn}.out_proj.weight"])
        dst[f"{ours}_out"]["bias"] = p[pre + f"{attn}.out_proj.bias"]
    dst["ff1"]["kernel"] = linear_kernel(p[pre + "linear1.weight"])
    dst["ff1"]["bias"] = p[pre + "linear1.bias"]
    dst["ff2"]["kernel"] = linear_kernel(p[pre + "linear2.weight"])
    dst["ff2"]["bias"] = p[pre + "linear2.bias"]
    for n in ("norm1", "norm2", "norm3"):
        dst[n]["scale"] = p[pre + f"{n}.weight"]
        dst[n]["bias"] = p[pre + f"{n}.bias"]


def import_omniparser(sd: Dict[str, np.ndarray], params: Dict,
                      prefix: str = "") -> Dict:
    """Full OmniParser checkpoint → our flax param tree.

    Covers everything the reference Checkpointer loads
    (OCR/OmniParser/utils/checkpointer.py:5): Swin backbone (Joiner element
    0, model/backbone/__init__.py:23 — Swin is not body-wrapped, unlike
    ResNet), FPN laterals (model/fpn.py:17 fpn_in[0..3] apply to c5..c2 —
    the same order as our lat0..3), input_proj (1x1 stride-2 conv,
    model/omniparser.py:15), DecoderEmbeddings (word + 3 task position
    embeddings + LayerNorm, model/transformer.py:283-328; the unused
    `other_position_embeddings` is skipped), and the three task decoders +
    3-layer MLP pred heads (model/transformer.py:26-37).

    For VIE checkpoints with added categories, run the embedding-resize
    surgery (`resize_embedding`) on the result, mirroring
    checkpointer.py:9 resize_embedding.
    """
    out = jax.tree.map(np.asarray, params)
    p = _TrackingDict({k[len(prefix):]: v for k, v in sd.items()
                       if k.startswith(prefix)})

    # ---- Swin backbone ----
    swin_sd = {k: v for k, v in p.items() if k.startswith("backbone.0.")}
    for k in swin_sd:
        p.read.add(k)
    out["backbone"] = jax.tree.map(
        np.asarray,
        import_swin(swin_sd, out["backbone"], prefix="backbone.0."))

    # ---- FPN laterals (1x1 convs → Dense kernels) ----
    for i in range(4):
        w = p[f"fpn.fpn_in.{i}.weight"]           # [256, cin, 1, 1]
        out["fpn"][f"lat{i}"]["kernel"] = w[:, :, 0, 0].T
        if f"fpn.fpn_in.{i}.bias" in p:
            out["fpn"][f"lat{i}"]["bias"] = p[f"fpn.fpn_in.{i}.bias"]

    # ---- input_proj ----
    out["input_proj"]["kernel"] = conv_kernel(p["input_proj.weight"])
    out["input_proj"]["bias"] = p["input_proj.bias"]

    # ---- DecoderEmbeddings ----
    emb = out["embedding"]
    emb["word"]["embedding"] = p["transformer.embedding.word_embeddings.weight"]
    for t in ("pt", "poly", "rec"):
        emb[f"{t}_pos"]["embedding"] = \
            p[f"transformer.embedding.{t}_position_embeddings.weight"]
    p.read.add("transformer.embedding.other_position_embeddings.weight")
    emb["ln"]["scale"] = p["transformer.embedding.LayerNorm.weight"]
    emb["ln"]["bias"] = p["transformer.embedding.LayerNorm.bias"]

    # ---- task decoders + pred heads ----
    for t in ("pt", "poly", "rec"):
        dec = out[f"{t}_decoder"]
        i = 0
        while f"layer_{i}" in dec:
            _omni_decoder_layer(p, dec[f"layer_{i}"],
                                f"transformer.{t}_decoder.layers.{i}.")
            i += 1
        dec["final_norm"]["scale"] = p[f"transformer.{t}_decoder.norm.weight"]
        dec["final_norm"]["bias"] = p[f"transformer.{t}_decoder.norm.bias"]
        for j, h in enumerate(("head1", "head2", "head3")):
            dec[h]["kernel"] = linear_kernel(
                p[f"transformer.{t}_pred_layer.layers.{j}.weight"])
            dec[h]["bias"] = p[f"transformer.{t}_pred_layer.layers.{j}.bias"]

    _warn_unused(p, "import_omniparser")
    return jax.tree.map(jnp.asarray,
                        _validate_shapes(params, out, "import_omniparser"))


def _inv_hf_rope_permute(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Undo the HF llama conversion's q/k row permutation.

    HF checkpoints store W_q/W_k reordered for the rotate_half rotary
    formulation (convert_llama_weights_to_hf.py permute()); our rotary is
    the original interleaved form, so imported rows must be permuted back.
    """
    out_dim, in_dim = w.shape
    hd = out_dim // n_heads
    return w.reshape(n_heads, 2, hd // 2, in_dim).transpose(0, 2, 1, 3) \
            .reshape(out_dim, in_dim)


def import_trcg(sd: Dict[str, np.ndarray], params: Dict,
                merge_lora: bool = True,
                lora_scale: Optional[float] = None,
                n_heads: int = 32) -> Dict:
    """Map the released TRCG stack onto models/trcg.py: vicuna-7B LLaMA
    (reference TRCG/llava/model/language_model/llava_llama.py — HF key
    layout model.layers.{i}.self_attn/mlp/input_layernorm/...), the CLIP
    ViT-L/14-336 vision tower (llava_arch.py build_vision_tower; HF keys
    model.vision_tower.vision_tower.vision_model...), the mlp2x_gelu
    mm_projector (model.mm_projector.{0,2}), and PEFT LoRA adapters from
    the finetune (scripts/finetune_flash_attn.sh lora_r 128).

    merge_lora=True folds adapters into the base kernels
    (W ← W + α/r · BᵀAᵀ in kernel layout — PEFT merge semantics); with
    False they map onto LoRADense's lora_A/lora_B so training can resume.
    """
    out = jax.tree.map(np.asarray, params)
    # normalize PEFT prefixes: base_model.model.<k> → <k>; strip the
    # ".base_layer" wrapper PEFT inserts on adapted Linears
    norm = {}
    for k, v in sd.items():
        if k.startswith("base_model.model."):
            k = k[len("base_model.model."):]
        k = k.replace(".base_layer.", ".")
        k = k.replace(".lora_A.default.", ".lora_A.")   # newer PEFT adds
        k = k.replace(".lora_B.default.", ".lora_B.")   # the adapter name
        norm[k] = _t(v)
    p = _TrackingDict(norm)

    def lin_t(dst, t, key="kernel"):
        dst[key] = linear_kernel(p[t + ".weight"])
        if t + ".bias" in norm:
            dst["bias"] = p[t + ".bias"]

    def rms(dst, t):
        dst["scale"] = p[t + ".weight"]

    # ---- language model ----
    out["embed_tokens"]["embedding"] = p["model.embed_tokens.weight"]
    n_layers = len([k for k in norm
                    if re.fullmatch(r"model\.layers\.\d+\.self_attn\.q_proj"
                                    r"\.weight", k)])
    for i in range(n_layers):
        t = f"model.layers.{i}"
        dst = out[f"layer_{i}"]
        rms(dst["attn_norm"], f"{t}.input_layernorm")
        rms(dst["ffn_norm"], f"{t}.post_attention_layernorm")
        for name in ("q_proj", "k_proj", "v_proj"):
            w = p[f"{t}.self_attn.{name}.weight"]
            la = f"{t}.self_attn.{name}.lora_A.weight"
            lb = f"{t}.self_attn.{name}.lora_B.weight"
            has_lora = la in norm
            rotary_rows = name in ("q_proj", "k_proj")
            node = dst[name]
            tgt = node["base"] if "base" in node else node
            if has_lora and merge_lora:
                A, B = p[la], p[lb]          # [r, in], [out, r]
                # PEFT merge: W ← W + (α/r)·B·A, in the HF layout the
                # adapters were trained against, BEFORE the rotary
                # row-permutation. α is not stored in the sd; the
                # reference finetune uses α=2r (lora_r 128, lora_alpha
                # 256) — override via lora_scale.
                scale = 2.0 if lora_scale is None else lora_scale
                w = w + scale * (B @ A)
                if rotary_rows:
                    w = _inv_hf_rope_permute(w, n_heads)
                tgt["kernel"] = linear_kernel(w)
            else:
                if rotary_rows:
                    w = _inv_hf_rope_permute(w, n_heads)
                tgt["kernel"] = linear_kernel(w)
                if has_lora and "lora_A" in node:
                    B = p[lb]
                    if rotary_rows:   # B's rows live in the out dimension
                        B = _inv_hf_rope_permute(B, n_heads)
                    node["lora_A"] = p[la].T     # [in, r]
                    node["lora_B"] = B.T         # [r, out]
        lin_t(dst["o_proj"], f"{t}.self_attn.o_proj")
        for name in ("gate_proj", "up_proj", "down_proj"):
            lin_t(dst[name], f"{t}.mlp.{name}")
    rms(out["final_norm"], "model.norm")
    lin_t(out["lm_head"], "lm_head")

    # ---- mm projector (mlp2x_gelu: Linear, GELU, Linear) ----
    lin_t(out["mm_projector_fc1"], "model.mm_projector.0")
    lin_t(out["mm_projector_fc2"], "model.mm_projector.2")

    # ---- CLIP vision tower ----
    vt = "model.vision_tower.vision_tower.vision_model"
    if f"{vt}.embeddings.class_embedding" in norm and "vision_tower" in out:
        dst = out["vision_tower"]
        dst["class_embedding"] = p[f"{vt}.embeddings.class_embedding"]
        dst["position_embedding"] = \
            p[f"{vt}.embeddings.position_embedding.weight"]
        dst["patch_embedding"]["kernel"] = \
            p[f"{vt}.embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
        dst["pre_layrnorm"]["scale"] = p[f"{vt}.pre_layrnorm.weight"]
        dst["pre_layrnorm"]["bias"] = p[f"{vt}.pre_layrnorm.bias"]
        i = 0
        while f"layers_{i}_norm1" in dst:
            t = f"{vt}.encoder.layers.{i}"
            for ln, src in (("norm1", "layer_norm1"), ("norm2", "layer_norm2")):
                dst[f"layers_{i}_{ln}"]["scale"] = p[f"{t}.{src}.weight"]
                dst[f"layers_{i}_{ln}"]["bias"] = p[f"{t}.{src}.bias"]
            for d, s in (("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
                         ("v", "self_attn.v_proj"),
                         ("out", "self_attn.out_proj"),
                         ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
                lin_t(dst[f"layers_{i}_{d}"], f"{t}.{s}")
            i += 1
        # under select_layer=-2 the final encoder layer(s) and the
        # post_layernorm never run (clip_encoder.py feature_select) —
        # consume their keys deliberately so they don't read as
        # accidentally-skipped weights
        for k in list(norm):
            if (k.startswith(f"{vt}.post_layernorm")
                    or (k.startswith(f"{vt}.encoder.layers.")
                        and int(k[len(f"{vt}.encoder.layers."):]
                                .split(".")[0]) >= i)):
                _ = p[k]

    _warn_unused(p, "import_trcg")
    return jax.tree.map(jnp.asarray,
                        _validate_shapes(params, out, "import_trcg"))


def import_fid_web(sd: Dict[str, np.ndarray], variables: Dict) -> Dict:
    """Map the released WebRPG FID discriminator (reference
    baselines_model/FID_model.py FIDWebModel: element VAE + chrlen
    Embedding + MarkupLM xpath embeddings + BERT-backed FIDBackbone) onto
    models/webrpg.py FIDWebModel variables."""
    out = jax.tree.map(np.asarray, variables)
    pr = out["params"]
    p = _TrackingDict({k: _t(v) for k, v in sd.items()})

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        if t + ".bias" in p:
            dst["bias"] = p[t + ".bias"]

    def ln(dst, t):
        dst["scale"] = p[t + ".weight"]
        dst["bias"] = p[t + ".bias"]

    # ---- vae (reuse the released-VAE key layout) ----
    vae_vars = import_webrpg_vae(
        {k: v for k, v in p.items() if k.startswith("vae.")},
        {"params": pr["vae"]}, prefix="vae.")
    pr["vae"] = jax.tree.map(np.asarray, vae_vars["params"])
    for k in list(p):
        if k.startswith("vae."):
            _ = p[k]

    # ---- chrlen embedding + xpath tables ----
    pr["chrlen_table"]["embedding"] = p["chrlen_embed.weight"]
    xp = "xpath_layer."
    depth = 0
    while f"{xp}xpath_tag_sub_embeddings.{depth}.weight" in p:
        depth += 1
    tags = np.concatenate(
        [p[f"{xp}xpath_tag_sub_embeddings.{d}.weight"]
         for d in range(depth)], 0)
    subs = np.concatenate(
        [p[f"{xp}xpath_subs_sub_embeddings.{d}.weight"]
         for d in range(depth)], 0)
    pr["xpath_layer"]["tag_emb"]["embedding"] = tags
    pr["xpath_layer"]["subs_emb"]["embedding"] = subs
    lin(pr["xpath_layer"]["proj1"], xp + "xpath_unitseq2_inner")
    lin(pr["xpath_layer"]["proj2"], xp + "inner2emb")

    # ---- backbone ----
    bb = pr["backbone"]
    lin(bb["in_embed"], "model.in_embed")
    lin(bb["chrlen_embed"], "model.chrlen_embed")
    lin(bb["xpath_embed"], "model.xpath_embed")
    bb["cls_text_embed"] = p["model.cls_text_embed"]
    be = "model.bert."
    bb["position_emb"]["embedding"] = \
        p[be + "embeddings.position_embeddings.weight"]
    bb["token_type_emb"]["embedding"] = \
        p[be + "embeddings.token_type_embeddings.weight"]
    ln(bb["emb_ln"], be + "embeddings.LayerNorm")
    i = 0
    while f"{be}encoder.layer.{i}.attention.self.query.weight" in p:
        t = f"{be}encoder.layer.{i}"
        lin(bb[f"layer_{i}_q"], f"{t}.attention.self.query")
        lin(bb[f"layer_{i}_k"], f"{t}.attention.self.key")
        lin(bb[f"layer_{i}_v"], f"{t}.attention.self.value")
        lin(bb[f"layer_{i}_attn_out"], f"{t}.attention.output.dense")
        ln(bb[f"layer_{i}_attn_ln"], f"{t}.attention.output.LayerNorm")
        lin(bb[f"layer_{i}_inter"], f"{t}.intermediate.dense")
        lin(bb[f"layer_{i}_out"], f"{t}.output.dense")
        ln(bb[f"layer_{i}_out_ln"], f"{t}.output.LayerNorm")
        i += 1
    lin(bb["pooler"], be + "pooler.dense")
    lin(bb["decoder_pred"], "model.decoder_pred")
    # defined-but-unused in the reference forward: word embeddings (BERT
    # runs on inputs_embeds) and model.norm — consume deliberately
    for k in (be + "embeddings.word_embeddings.weight",
              "model.norm.weight", "model.norm.bias"):
        if k in p:
            _ = p[k]

    _warn_unused(p, "import_fid_web")
    out["params"] = pr
    return jax.tree.map(jnp.asarray,
                        _validate_shapes(variables, out, "import_fid_web"))


def import_lvtr(sd: Dict[str, np.ndarray], params: Dict) -> Dict:
    """Map a released LVTR decoder checkpoint (reference
    train_lvtr.py:350-360 accelerate save of the dalle2-pytorch Decoder;
    Unet under `unets.0.`, dalle2_pytorch.py:1281 at the cfgs_lvtr.py
    config) onto models/lvtr.py LVTRDalleUnet.

    Decoder-level pieces outside the Unet (frozen ExCTC recognizer copy,
    attention poolers, text position table, noise-scheduler buffers, null
    VAEs) are consumed deliberately — the flax side reimplements the
    schedule analytically and takes the recognizer via its own importer.
    """
    out = jax.tree.map(np.asarray, params)
    p = _TrackingDict({k: _t(v) for k, v in sd.items()})
    U = "unets.0."

    def conv(dst, t):
        dst["kernel"] = p[t + ".weight"].transpose(2, 3, 1, 0)
        if t + ".bias" in p:
            dst["bias"] = p[t + ".bias"]

    def lin(dst, t):
        dst["kernel"] = linear_kernel(p[t + ".weight"])
        if t + ".bias" in p:
            dst["bias"] = p[t + ".bias"]

    def norm(dst, t, g_only=False):
        if g_only:
            dst["scale"] = p[t + ".g"]
        else:
            dst["scale"] = p[t + ".weight"]
            dst["bias"] = p[t + ".bias"]

    def attn(dst, t):
        norm(dst["norm"], f"{t}.norm", g_only=True)
        dst["to_q"]["kernel"] = linear_kernel(p[f"{t}.to_q.weight"])
        dst["to_kv"]["kernel"] = linear_kernel(p[f"{t}.to_kv.weight"])
        dst["to_out"]["kernel"] = linear_kernel(p[f"{t}.to_out.0.weight"])
        norm(dst["out_norm"], f"{t}.to_out.1", g_only=True)
        dst["null_kv"] = p[f"{t}.null_kv"]

    def resblock(dst, t):
        lin(dst["time_mlp"], f"{t}.time_mlp.1")
        conv(dst["block1_conv"], f"{t}.block1.project")
        norm(dst["block1_norm"], f"{t}.block1.norm")
        if "cross_attn" in dst:
            attn(dst["cross_attn"], f"{t}.cross_attn")
        conv(dst["block2_conv"], f"{t}.block2.project")
        norm(dst["block2_norm"], f"{t}.block2.norm")
        if "res_conv" in dst:
            conv(dst["res_conv"], f"{t}.res_conv")

    n_init = len([k for k in p
                  if re.fullmatch(rf"{re.escape(U)}init_conv\.convs\.\d+"
                                  r"\.weight", k)])
    for i in range(n_init):
        conv(out[f"init_conv_{i}"], f"{U}init_conv.convs.{i}")
    lin(out["to_time_hiddens"], f"{U}to_time_hiddens.1")
    lin(out["to_time_tokens"], f"{U}to_time_tokens.0")
    lin(out["to_time_cond"], f"{U}to_time_cond.0")
    lin(out["image_to_tokens"], f"{U}image_to_tokens.0")
    lin(out["to_image_hiddens"], f"{U}to_image_hiddens.0")
    lin(out["text_to_cond"], f"{U}text_to_cond")
    norm(out["norm_cond"], f"{U}norm_cond")
    norm(out["norm_mid_cond"], f"{U}norm_mid_cond")
    out["null_text_embed"] = p[f"{U}null_text_embed"][0]

    n_stages = len({int(k[len(U) + 6:].split(".")[0]) for k in p
                    if k.startswith(f"{U}downs.")})
    n_blocks = len({int(k.split(".")[5]) for k in p
                    if k.startswith(f"{U}downs.0.2.")})
    for s in range(n_stages):
        resblock(out[f"downs_{s}_init"], f"{U}downs.{s}.1")
        for j in range(n_blocks):
            resblock(out[f"downs_{s}_block{j}"], f"{U}downs.{s}.2.{j}")
        if f"{U}downs.{s}.4.1.weight" in p:        # Rearrange + 1x1 conv
            conv(out[f"downs_{s}_ds"], f"{U}downs.{s}.4.1")
        else:                                       # last stage: plain 1x1
            conv(out[f"downs_{s}_ds"], f"{U}downs.{s}.4")
    resblock(out["mid_block1"], f"{U}mid_block1")
    attn(out["mid_attn"], f"{U}mid_attn.fn.fn")
    resblock(out["mid_block2"], f"{U}mid_block2")
    for s in range(n_stages):
        resblock(out[f"ups_{s}_init"], f"{U}ups.{s}.0")
        for j in range(n_blocks):
            resblock(out[f"ups_{s}_block{j}"], f"{U}ups.{s}.1.{j}")
        if f"{U}ups.{s}.3.net.0.weight" in p:      # PixelShuffleUpsample
            conv(out[f"ups_{s}_us"], f"{U}ups.{s}.3.net.0")
    resblock(out["final_resnet_block"], f"{U}final_resnet_block")
    conv(out["to_out"], f"{U}to_out")

    # deliberately-consumed decoder-level extras (see docstring)
    for k in list(p):
        if (k.startswith(("recognizer.", "attn_pooling", "abs_pos_emb_text",
                          "noise_schedulers.", "vaes.", "lowres_conds."))
                or k in (f"{U}null_image_embed", f"{U}null_image_hiddens",
                         f"{U}null_imagestyle_embed",
                         f"{U}word_embedding.weight")):
            _ = p[k]

    _warn_unused(p, "import_lvtr")
    return jax.tree.map(jnp.asarray,
                        _validate_shapes(params, out, "import_lvtr"))


TORCH_IMPORTERS: Dict[str, Callable] = {
    "mgp_str": import_mgp_str,
    "swin": import_swin,
    "focalnet": import_focalnet,
    "lister": import_lister,
    "dla": import_dla,            # full variables (params + batch_stats)
    "abinet_vision": import_abinet_vision,  # full variables
    "levt": import_levt,
    "levocr": import_levocr,      # full variables
    "geolayoutlm_backbone": import_geolayoutlm_backbone,
    "geolayoutlm_vie": import_geolayoutlm_vie,
    "omniparser": import_omniparser,
    "lore_processor": import_lore_processor,
    "vgt": import_vgt,            # full variables (params + batch_stats)
    "vgt_cascade": import_vgt_cascade,  # backbone + RPN + cascade head
    "docxlayout": import_docxlayout,  # released DocXLayout_231012.pth
    "webrpg_vae": import_webrpg_vae,  # released element VAE
    "gem_markuplm": import_gem_markuplm,  # MarkupLM/GEM encoder
    "vlpt": import_vlpt,          # released VLPT-STD pretrain ckpt
    "trcg": import_trcg,          # vicuna-7B + CLIP-L/14-336 + projector
    "lvtr": import_lvtr,          # dalle2-pytorch Decoder → LVTRDalleUnet
    "fid_web": import_fid_web,    # WebRPG FID discriminator (feature model)
}

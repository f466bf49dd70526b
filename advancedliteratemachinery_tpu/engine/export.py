"""Serialized-model export: jitted forwards → portable StableHLO.

The reference ships a mobile deployment path (LiteWeightOCR: models
exported to MNN and invoked from a prebuilt runtime,
OCR/LiteWeightOCR/platform/IOS). The TPU-native analog is `jax.export`:
the jitted forward (weights embedded as constants) serializes to a
self-contained StableHLO artifact that any JAX runtime — CPU, GPU or
TPU, with no access to this package — can deserialize and call.

Artifact layout: a single file containing the serialized exported call;
input is a uint8 image batch of the fixed exported shape, output the
model's logits dict (MGP-STR) / decode dict (LISTER).
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import numpy as np


def export_recognizer(model_name: str, variant: str, out_path: str,
                      batch_size: int = 1, ckpt: str = None,
                      torch_ckpt: str = None) -> Tuple[str, int]:
    """Serialize a recognizer forward (uint8 [B,32,128,3] crops →
    outputs) to `out_path`. Returns (path, artifact bytes)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from advancedliteratemachinery_tpu.ops.image import normalize_crops

    if model_name == "mgp_str":
        from advancedliteratemachinery_tpu.models.mgp_str import (
            MGPSTR, MGPSTRConfig)

        model = MGPSTR(MGPSTRConfig(variant=variant))
        x0 = jnp.zeros((1, 32, 128, 3))
        variables = {"params": jax.jit(model.init)(
            jax.random.PRNGKey(0), x0)["params"]}

        def fwd(v, u8):
            return model.apply(v, normalize_crops(
                u8, dtype=model.policy.compute_dtype))
    elif model_name == "lister":
        from advancedliteratemachinery_tpu.models.lister import (
            LISTER, LISTERConfig)

        model = LISTER(LISTERConfig(variant=variant))
        x0 = jnp.zeros((1, 32, 128, 3))
        m0 = jnp.ones((1, 32, 128))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, m0)

        def fwd(v, u8):
            x = normalize_crops(u8, dtype=model.policy.compute_dtype)
            mask = jnp.ones(u8.shape[:3], x.dtype)
            return model.apply(v, x, mask)
    else:
        raise ValueError(f"export: unsupported model {model_name!r}")

    if torch_ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            TORCH_IMPORTERS, load_torch_state_dict)

        sd = load_torch_state_dict(torch_ckpt)
        if model_name == "mgp_str":
            variables = {"params": TORCH_IMPORTERS["mgp_str"](
                sd, jax.tree.map(np.asarray, variables["params"]))}
        else:
            variables = {"params": TORCH_IMPORTERS["lister"](
                sd, jax.tree.map(np.asarray, dict(variables))["params"])}
    elif ckpt:
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            load_params_checkpoint)

        variables = load_params_checkpoint(ckpt, variables)

    # close over the weights so the artifact is self-contained
    fn = jax.jit(lambda u8: fwd(variables, u8))
    spec = jax.ShapeDtypeStruct((batch_size, 32, 128, 3), jnp.uint8)
    exported = jex.export(fn)(spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path, len(data)


def load_exported(path: str) -> Callable:
    """Deserialize an exported artifact → callable(u8_batch) → outputs.
    Needs only jax — not this package's model code."""
    from jax import export as jex

    with open(path, "rb") as f:
        exported = jex.deserialize(f.read())
    return exported.call

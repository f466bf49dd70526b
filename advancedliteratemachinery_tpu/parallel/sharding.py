"""Parameter sharding rules.

Rule-based inference of PartitionSpecs over a flax param pytree, so models
don't hand-annotate every weight. Policy:

- 2D kernels whose output dim is large (>= tp_threshold) are column-sharded
  over the ``model`` axis (tensor parallel); their biases likewise.
- When an ``fsdp`` axis of size > 1 exists, remaining float arrays are
  sharded over fsdp along their largest divisible dimension (ZeRO-3-style
  parameter sharding; reference analog: SceneVTG TRCG DeepSpeed zero3).
- Everything else is replicated.

This yields real tp+fsdp+dp shardings for `dryrun_multichip` and the train
engine without per-model annotation tables.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from advancedliteratemachinery_tpu.parallel.mesh import AXIS_FSDP, AXIS_MODEL


def _spec_for_leaf(path: str, x: Any, mesh: Mesh, tp_threshold: int) -> P:
    model_size = mesh.shape.get(AXIS_MODEL, 1)
    fsdp_size = mesh.shape.get(AXIS_FSDP, 1)
    shape = getattr(x, "shape", ())
    ndim = len(shape)

    # Tensor-parallel: shard huge vocabulary projection heads column-wise.
    if model_size > 1 and ndim >= 2 and shape[-1] >= tp_threshold and shape[-1] % model_size == 0:
        return P(*([None] * (ndim - 1)), AXIS_MODEL)
    if model_size > 1 and ndim == 1 and shape[0] >= tp_threshold and shape[0] % model_size == 0:
        return P(AXIS_MODEL)

    # FSDP: shard the largest dim divisible by the fsdp axis.
    if fsdp_size > 1 and ndim >= 1:
        dims = sorted(range(ndim), key=lambda d: -shape[d])
        for d in dims:
            if shape[d] >= 2 * fsdp_size and shape[d] % fsdp_size == 0:
                spec = [None] * ndim
                spec[d] = AXIS_FSDP
                return P(*spec)

    return P()


def infer_param_specs(params, mesh: Mesh, tp_threshold: int = 8192):
    """Return a pytree of PartitionSpec matching ``params``."""

    def f(path, x):
        pstr = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        return _spec_for_leaf(pstr, x, mesh, tp_threshold)

    return jax.tree_util.tree_map_with_path(f, params)


def param_shardings(params, mesh: Mesh, tp_threshold: int = 8192):
    specs = infer_param_specs(params, mesh, tp_threshold)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda s: isinstance(s, P))


def shard_params(params, mesh: Mesh, tp_threshold: int = 8192):
    """Device-put a param pytree with inferred shardings."""
    shardings = param_shardings(params, mesh, tp_threshold)
    return jax.device_put(params, shardings)

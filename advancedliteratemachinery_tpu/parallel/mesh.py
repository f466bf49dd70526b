"""Device mesh construction.

Replaces every NCCL process-group bootstrap in the reference
(LISTER train_dist.py:30 `dist.init_process_group("nccl")`,
OmniParser utils/dist.py:43, MGP-STR utils_dist init, detectron2 `launch`
in VGT train_VGT.py:156, PL `strategy: ddp` in GeoLayoutLM): on TPU the
runtime is bootstrapped by `jax.distributed.initialize()` (multi-host only)
and all communication is expressed as shardings over a named mesh —
XLA emits the ICI/DCN collectives.

Mesh axes:
  - ``data``  — batch (data-parallel) axis; gradients are reduced over it.
  - ``fsdp``  — parameter-sharding axis (ZeRO-3-style, reference:
                SceneVTG TRCG deepspeed zero3.json); batch is also split
                over it (dp*fsdp = global batch shards).
  - ``model`` — tensor-parallel axis for large projection heads
                (e.g. MGP-STR's 50257-way BPE head).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_MODEL = "model"
MESH_AXES = (AXIS_DATA, AXIS_FSDP, AXIS_MODEL)


def maybe_initialize_distributed() -> None:
    """Multi-host bootstrap. No-op on a single host."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def create_mesh(
    data: int = -1,
    fsdp: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, fsdp, model) mesh. data=-1 means "all remaining devices".

    Device placement goes through `jax.experimental.mesh_utils
    .create_device_mesh`, which lays the innermost (model) axis along
    contiguous ICI links on real TPU topologies so tensor-parallel
    collectives ride the fastest links; a plain reshape is only the
    fallback for device sets mesh_utils cannot handle (e.g. an explicit
    non-contiguous subset).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (fsdp * model) != 0:
            raise ValueError(f"{n} devices not divisible by fsdp*model={fsdp * model}")
        data = n // (fsdp * model)
    if data * fsdp * model != n:
        raise ValueError(f"mesh {data}x{fsdp}x{model} != {n} devices")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(
            (data, fsdp, model), devices=devices
        )
    except Exception:
        dev_array = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(dev_array, MESH_AXES)


def batch_spec() -> P:
    """Batch dim is sharded over both data and fsdp axes."""
    return P((AXIS_DATA, AXIS_FSDP))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

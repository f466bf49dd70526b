from advancedliteratemachinery_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_FSDP,
    AXIS_MODEL,
    create_mesh,
    batch_spec,
    batch_sharding,
    replicated_sharding,
)
from advancedliteratemachinery_tpu.parallel.sharding import (
    infer_param_specs,
    shard_params,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_FSDP",
    "AXIS_MODEL",
    "create_mesh",
    "batch_spec",
    "batch_sharding",
    "replicated_sharding",
    "infer_param_specs",
    "shard_params",
]

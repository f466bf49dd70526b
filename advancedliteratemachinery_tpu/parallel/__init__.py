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
from advancedliteratemachinery_tpu.parallel.pipeline import (
    AXIS_PIPE,
    create_pipeline_mesh,
    gpipe_apply,
    make_scan_stage,
    partition_stages,
    split_microbatches,
    stack_layer_params,
)
from advancedliteratemachinery_tpu.parallel.ring_attention import (
    AXIS_SEQ,
    create_seq_mesh,
    ring_attention,
)

__all__ = [
    "AXIS_PIPE",
    "AXIS_SEQ",
    "create_seq_mesh",
    "ring_attention",
    "create_pipeline_mesh",
    "gpipe_apply",
    "make_scan_stage",
    "partition_stages",
    "split_microbatches",
    "stack_layer_params",
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

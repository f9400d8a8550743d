from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_variables_for_inference,
)
from .pipeline import (
    STAGE_AXIS,
    make_pipeline_mesh,
    make_pipeline_trunk,
    opt_layer_apply,
    shard_stacked,
    stack_layer_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "STAGE_AXIS",
    "batch_sharding",
    "make_mesh",
    "make_pipeline_mesh",
    "make_pipeline_trunk",
    "opt_layer_apply",
    "param_shardings",
    "replicated",
    "shard_batch",
    "shard_variables_for_inference",
    "shard_stacked",
    "stack_layer_params",
]

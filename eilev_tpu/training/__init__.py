from .train_state import (
    OptimizerConfig,
    TrainState,
    eval_step,
    make_optimizer,
    make_train_step,
    merge_params,
    partition_params,
    zero_sharded_opt_state,
)

__all__ = [
    "OptimizerConfig",
    "TrainState",
    "eval_step",
    "make_optimizer",
    "make_train_step",
    "merge_params",
    "partition_params",
    "zero_sharded_opt_state",
]

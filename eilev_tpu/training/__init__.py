from .train_state import (
    OptimizerConfig,
    TrainState,
    ema_params,
    eval_step,
    make_optimizer,
    make_train_step,
    merge_params,
    partition_params,
    with_param_ema,
    zero_sharded_opt_state,
)

__all__ = [
    "OptimizerConfig",
    "TrainState",
    "ema_params",
    "eval_step",
    "make_optimizer",
    "make_train_step",
    "merge_params",
    "partition_params",
    "with_param_ema",
    "zero_sharded_opt_state",
]

from advancedliteratemachinery_tpu.engine.fit import (
    FitConfig,
    FitResult,
    fit,
    latest_checkpoint_step,
    restore_train_state,
    save_train_state,
)
from advancedliteratemachinery_tpu.engine.train import (
    TrainState,
    cross_entropy_ignore_pad,
    make_mgp_str_train_step,
    make_optimizer,
    make_train_step,
)
from advancedliteratemachinery_tpu.engine.train_extras import (
    MutableTrainState,
    make_mutable_train_step,
)

__all__ = [
    "FitConfig",
    "FitResult",
    "MutableTrainState",
    "TrainState",
    "cross_entropy_ignore_pad",
    "fit",
    "latest_checkpoint_step",
    "make_mgp_str_train_step",
    "make_mutable_train_step",
    "make_optimizer",
    "make_train_step",
    "restore_train_state",
    "save_train_state",
]

from advancedliteratemachinery_tpu.engine.train import (
    TrainState,
    cross_entropy_ignore_pad,
    make_mgp_str_train_step,
    make_optimizer,
)

__all__ = [
    "TrainState",
    "cross_entropy_ignore_pad",
    "make_mgp_str_train_step",
    "make_optimizer",
]

from umnn_tpu.training.loops import (
    ReduceLROnPlateau,
    TrainState,
    batch_iter,
    get_learning_rate,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

__all__ = [
    "ReduceLROnPlateau",
    "TrainState",
    "batch_iter",
    "get_learning_rate",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "set_learning_rate",
]

from hyperpri_tpu.train.checkpoint import (
    DualCheckpointManager,
    find_eval_checkpoint,
    find_resume_checkpoint,
    load_pytree,
    save_pytree,
)
from hyperpri_tpu.train.evaluate import test_net, validate_net
from hyperpri_tpu.train.trainer import (
    FitResult,
    Trainer,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    train_net,
)

__all__ = [
    "DualCheckpointManager",
    "find_eval_checkpoint",
    "find_resume_checkpoint",
    "load_pytree",
    "save_pytree",
    "test_net",
    "validate_net",
    "FitResult",
    "Trainer",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "train_net",
]

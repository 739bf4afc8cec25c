"""Training layer: optax optimizer/schedule, jitted train/eval steps,
checkpointing, orchestration (train_model / evaluate_model parity API)."""

from enhanced_unet_tpu.train.schedule import reference_lr_schedule, make_lr_fn
from enhanced_unet_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from enhanced_unet_tpu.train.evaluator import Evaluator
from enhanced_unet_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)

__all__ = [
    "reference_lr_schedule",
    "make_lr_fn",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "Evaluator",
    "checkpoint_exists",
    "load_checkpoint",
    "save_checkpoint",
]

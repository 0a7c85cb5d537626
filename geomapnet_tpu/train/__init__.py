"""Functional training engine: state, steps, optimizers, loop, checkpoints."""

from .optim import make_lr_schedule, make_optimizer
from .state import TrainState, create_train_state, make_eval_step, make_train_step
from .checkpoint import (
    adapt_model_params,
    latest_checkpoint,
    load_model_params,
    restore_checkpoint,
    save_checkpoint,
)
from .loop import Trainer

"""Training harness: trainer loop, optimizer, checkpoints, metrics."""

from matcha_tpu.train.checkpoints import CheckpointStore
from matcha_tpu.train.trainer import (
    MetricLogger,
    TrainConfig,
    Trainer,
    make_eval_step,
    make_optimizer,
    make_train_step,
    total_loss,
)

__all__ = [
    "Trainer",
    "TrainConfig",
    "CheckpointStore",
    "MetricLogger",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "total_loss",
]

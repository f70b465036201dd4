from .checkpoint import load_checkpoint, reference_meta, save_checkpoint
from .ctc_loop import train_ctc
from .loop import train
from .step import (
    StepConfig,
    make_eval_step,
    make_multi_train_step,
    make_optimizer,
    make_train_step,
    smoothed_cross_entropy,
)

__all__ = [
    "load_checkpoint",
    "reference_meta",
    "save_checkpoint",
    "train",
    "train_ctc",
    "StepConfig",
    "make_eval_step",
    "make_multi_train_step",
    "make_optimizer",
    "make_train_step",
    "smoothed_cross_entropy",
]

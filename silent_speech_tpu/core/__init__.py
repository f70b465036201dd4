from .landmarks import (
    FIXED_IDXS,
    N_POINTS,
    LEFT_CORNER,
    RIGHT_CORNER,
    UPPER_INNER,
    LOWER_INNER,
    LIP_ORDER,
    WORDS,
)
from .schema import Clip, ClipBatch, load_clip, save_clip, clip_filename, parse_filename_label
from .config import (
    RecorderConfig,
    TrainConfig,
    InferConfig,
    CTCTrainConfig,
    StreamConfig,
)

__all__ = [
    "FIXED_IDXS",
    "N_POINTS",
    "LEFT_CORNER",
    "RIGHT_CORNER",
    "UPPER_INNER",
    "LOWER_INNER",
    "LIP_ORDER",
    "WORDS",
    "Clip",
    "ClipBatch",
    "load_clip",
    "save_clip",
    "clip_filename",
    "parse_filename_label",
    "RecorderConfig",
    "TrainConfig",
    "InferConfig",
    "CTCTrainConfig",
    "StreamConfig",
]

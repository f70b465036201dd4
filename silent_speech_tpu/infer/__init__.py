from .predictor import Predictor, load_predictor, topk_from_logits
from .evaluator import evaluate_dataset, evaluate_temporal_cnn, zscore
from .streaming import CarryStreamingGRU, ClipEvent, OpennessGate, SlidingWindowEngine
from .ctc_decode import CTCDecoder, Dictionary, trim_silence

__all__ = [
    "Predictor",
    "load_predictor",
    "topk_from_logits",
    "evaluate_dataset",
    "evaluate_temporal_cnn",
    "zscore",
    "CarryStreamingGRU",
    "ClipEvent",
    "OpennessGate",
    "SlidingWindowEngine",
    "CTCDecoder",
    "Dictionary",
    "trim_silence",
]
from .variant_predictor import VariantPredictor  # noqa: E402

__all__.append("VariantPredictor")

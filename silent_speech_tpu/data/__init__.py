from .corpus import (
    CorpusIndex,
    build_label_maps,
    filter_modal_dim,
    inverse_frequency_weights,
    load_clips,
    scan_corpus,
    split_by_label,
    stratified_split_3way,
    top_confusions,
    warn_mixed_idx_signatures,
    weighted_sample_epoch,
)
from .dataset import DeviceDataset, build_device_dataset, epoch_batches
from .augment import (
    AugmentConfig,
    OFFICIAL_AUGMENT,
    REDUCED_AUGMENT,
    augment_batch,
    mixup,
)

__all__ = [
    "CorpusIndex",
    "build_label_maps",
    "filter_modal_dim",
    "inverse_frequency_weights",
    "load_clips",
    "scan_corpus",
    "split_by_label",
    "stratified_split_3way",
    "top_confusions",
    "warn_mixed_idx_signatures",
    "weighted_sample_epoch",
    "DeviceDataset",
    "build_device_dataset",
    "epoch_batches",
    "AugmentConfig",
    "OFFICIAL_AUGMENT",
    "REDUCED_AUGMENT",
    "augment_batch",
    "mixup",
]

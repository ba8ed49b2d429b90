"""Data pipeline: LJSpeech acquisition, bucketed static-shape batching."""

from matcha_tpu.data.dataset import (
    DataConfig,
    SyntheticDataset,
    TextMelDataset,
    batch_iterator,
    collate,
)
from matcha_tpu.data.ljspeech import prepare, process_csv

__all__ = [
    "DataConfig",
    "TextMelDataset",
    "SyntheticDataset",
    "batch_iterator",
    "collate",
    "prepare",
    "process_csv",
]

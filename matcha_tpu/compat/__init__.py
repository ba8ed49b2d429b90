"""Compatibility: torch checkpoint -> JAX parameter converters."""

from matcha_tpu.compat.torch_import import (
    convert_hifigan_state_dict,
    convert_matcha_state_dict,
    load_hifigan_torch_checkpoint,
    load_matcha_torch_checkpoint,
)

__all__ = [
    "convert_matcha_state_dict",
    "convert_hifigan_state_dict",
    "load_matcha_torch_checkpoint",
    "load_hifigan_torch_checkpoint",
]

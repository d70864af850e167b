"""Interop with the PyTorch reference (checkpoint conversion)."""

from .torch_loader import (
    load_state_dict,
    load_model,
    convert_denoiser,
    convert_super_resolution,
    convert_stereo_separator,
    CONVERTERS,
)

__all__ = [
    "load_state_dict",
    "load_model",
    "convert_denoiser",
    "convert_super_resolution",
    "convert_stereo_separator",
    "CONVERTERS",
]

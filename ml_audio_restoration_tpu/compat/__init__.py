"""Interop with the PyTorch reference (checkpoint conversion)."""

from .torch_loader import (
    load_state_dict,
    load_model,
    convert_denoiser,
    convert_super_resolution,
    convert_stereo_separator,
    CONVERTERS,
)
from .torch_saver import (
    save_pth,
    export_denoiser,
    export_super_resolution,
    export_stereo_separator,
    EXPORTERS,
)

__all__ = [
    "load_state_dict",
    "load_model",
    "convert_denoiser",
    "convert_super_resolution",
    "convert_stereo_separator",
    "CONVERTERS",
    "save_pth",
    "export_denoiser",
    "export_super_resolution",
    "export_stereo_separator",
    "EXPORTERS",
]

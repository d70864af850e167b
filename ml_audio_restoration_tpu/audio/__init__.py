"""Audio I/O, normalization, resampling and analytics."""

from .wav import (read_wav, write_wav, decode_wav, encode_wav, wav_info,
                  WavInfo)
from .flac import read_flac, write_flac, flac_info, FlacInfo
from .io import (
    load_audio,
    load_audio_chunk,
    save_audio,
    normalize_audio,
    resample,
    add_noise,
    apply_highpass_filter,
    find_audio_files,
    AUDIO_EXTENSIONS,
)

__all__ = [
    "read_wav",
    "write_wav",
    "decode_wav",
    "encode_wav",
    "wav_info",
    "WavInfo",
    "read_flac",
    "write_flac",
    "flac_info",
    "FlacInfo",
    "load_audio",
    "load_audio_chunk",
    "save_audio",
    "normalize_audio",
    "resample",
    "add_noise",
    "apply_highpass_filter",
    "find_audio_files",
    "AUDIO_EXTENSIONS",
]

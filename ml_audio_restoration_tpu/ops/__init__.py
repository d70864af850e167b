"""TPU-first NN/DSP primitives (NWC layout, jit/vmap/scan-native)."""

from .conv import (
    conv1d,
    conv_transpose1d,
    max_pool1d,
    moving_average,
    leaky_relu,
    batch_norm,
    batch_norm_train,
    batch_norm_train_packed,
)
from .interp import interp_linear, upsample_linear
from .stft import hann_window, frame, stft, stft_magnitude, istft
from .lstm import lstm, lstm_init
from .filters import (
    butter_coeffs,
    butter_sos,
    butter_bank,
    bank_select,
    lfilter,
    filtfilt,
    sosfilt,
    sosfiltfilt,
    butter_filtfilt,
)
from .chunking import (
    chunk_signal,
    overlap_add,
    crossfade_window,
    num_chunks,
    frame_structured,
)

__all__ = [
    "conv1d",
    "conv_transpose1d",
    "max_pool1d",
    "moving_average",
    "leaky_relu",
    "batch_norm",
    "batch_norm_train",
    "batch_norm_train_packed",
    "interp_linear",
    "upsample_linear",
    "hann_window",
    "frame",
    "stft",
    "stft_magnitude",
    "istft",
    "lstm",
    "lstm_init",
    "butter_coeffs",
    "butter_sos",
    "butter_bank",
    "sosfilt",
    "sosfiltfilt",
    "bank_select",
    "lfilter",
    "filtfilt",
    "butter_filtfilt",
    "chunk_signal",
    "overlap_add",
    "frame_structured",
    "crossfade_window",
    "num_chunks",
]

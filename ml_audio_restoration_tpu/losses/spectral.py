"""Spectral losses.

- multiscale_spectral_loss: the trainer's built-in multi-scale log-STFT
  magnitude L1 (/root/reference/src/training/trainer.py:256-301): FFT sizes
  (512, 1024, 2048), hop = fft/4, periodic Hann, log(|S|+1e-5), averaged over
  scales x channels.
- transient_spectral_loss: the standalone SpectralLoss
  (/root/reference/src/models/super_resolution.py:125-235): alpha*MSE +
  w*transient-weighted-L1 + (1-alpha-w)*multi-scale-spec.
  NOTE: the reference implementation crashes at runtime — its even-kernel
  smoothing/dilation convs grow the transient mask to T+2 samples, which no
  longer broadcasts against [B, C, T] (verified by running it; it is also
  never instantiated by any training script). We implement the *intended*
  semantics with length-preserving smoothing.

All losses take [B, T, C] (channels-last) arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import stft_magnitude, moving_average

FFT_SIZES = (512, 1024, 2048)
LOG_EPS = 1e-5


def multiscale_spectral_loss(output, target, fft_sizes=FFT_SIZES):
    """Multi-scale log-magnitude L1. output/target: [B, T, C]."""
    b, t, c = output.shape
    out_flat = output.transpose(0, 2, 1).reshape(b * c, t)
    tgt_flat = target.transpose(0, 2, 1).reshape(b * c, t)
    loss = 0.0
    for n_fft in fft_sizes:
        hop = n_fft // 4
        om = stft_magnitude(out_flat, n_fft, hop)
        tm = stft_magnitude(tgt_flat, n_fft, hop)
        loss += jnp.mean(jnp.abs(jnp.log(om + LOG_EPS) - jnp.log(tm + LOG_EPS)))
    return loss / len(fft_sizes)


def detect_transients(audio):
    """Envelope-derivative transient mask (intended semantics of
    super_resolution.py:138-171, with length-preserving convs).

    audio: [B, T] -> binary-ish mask [B, T] in [0, 1].
    """
    env = jnp.abs(audio)[:, :, None]  # [B, T, 1]
    # odd kernel -> exact 'same' length (the reference's even k=64 is what
    # breaks its shapes)
    env_smooth = moving_average(env, 65)[:, :, 0]
    diff = jnp.abs(env_smooth[:, 1:] - env_smooth[:, :-1])
    diff = jnp.pad(diff, ((0, 0), (0, 1)))
    threshold = jnp.quantile(diff, 0.9, axis=-1, keepdims=True)
    mask = (diff > threshold).astype(audio.dtype)
    # Dilate ~64 samples each side to cover the full attack.
    dilated = moving_average(mask[:, :, None], 129)[:, :, 0] * 129.0
    return jnp.clip(dilated, 0.0, 1.0)


def transient_spectral_loss(output, target, fft_sizes=FFT_SIZES,
                            alpha: float = 0.3, transient_weight: float = 0.3):
    """alpha*MSE + w*(2x-weighted transient L1) + (1-alpha-w)*spec."""
    time_loss = jnp.mean(jnp.square(output - target))

    mask = detect_transients(target[:, :, 0])[:, :, None]
    diff = jnp.abs(output - target)
    transient_loss = jnp.mean(diff * mask)
    steady_loss = jnp.mean(diff * (1.0 - mask))
    transient_time_loss = transient_loss * 2.0 + steady_loss

    spec = multiscale_spectral_loss(output, target, fft_sizes)
    return (alpha * time_loss
            + transient_weight * transient_time_loss
            + (1.0 - alpha - transient_weight) * spec)

"""Audio restoration quality metrics.

The reference ships no quantitative quality evaluation at all (its quality
table is marked illustrative, docs/QUICK_START_MIXED_TRAINING.md:107-115;
SURVEY.md §6). These are the standard objective metrics for restoration /
bandwidth extension, jnp-native so they run on-device over batches:

- snr: signal-to-noise ratio of an estimate against a clean target (dB)
- si_sdr: scale-invariant SDR (Le Roux et al. 2019) — gain-robust
- lsd: log-spectral distance (dB), the standard bandwidth-extension metric
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import stft_magnitude

_EPS = 1e-8


def snr(estimate, target, axis=-1):
    """10 log10(||target||^2 / ||target - estimate||^2) in dB."""
    signal = jnp.sum(jnp.square(target), axis=axis)
    noise = jnp.sum(jnp.square(target - estimate), axis=axis)
    return 10.0 * jnp.log10((signal + _EPS) / (noise + _EPS))


def si_sdr(estimate, target, axis=-1):
    """Scale-invariant SDR: project the estimate onto the target first."""
    dot = jnp.sum(estimate * target, axis=axis, keepdims=True)
    energy = jnp.sum(jnp.square(target), axis=axis, keepdims=True)
    projection = dot / (energy + _EPS) * target
    residual = estimate - projection
    return 10.0 * jnp.log10(
        (jnp.sum(jnp.square(projection), axis=axis) + _EPS)
        / (jnp.sum(jnp.square(residual), axis=axis) + _EPS))


def lsd(estimate, target, n_fft: int = 2048, hop: int | None = None):
    """Log-spectral distance in dB over [B, T] (or [T]) signals:
    mean over frames of the RMS over bins of 10*(log10|S_est|^2-log10|S_tgt|^2)."""
    hop = hop or n_fft // 4
    est = jnp.atleast_2d(estimate)
    tgt = jnp.atleast_2d(target)
    em = stft_magnitude(est, n_fft, hop)
    tm = stft_magnitude(tgt, n_fft, hop)
    d = 10.0 * (jnp.log10(jnp.square(em) + _EPS)
                - jnp.log10(jnp.square(tm) + _EPS))
    return jnp.mean(jnp.sqrt(jnp.mean(jnp.square(d), axis=-1)))

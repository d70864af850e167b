"""78rpm artifact simulator — on-device, PRNG-keyed, jit/vmap-able.

Capability parity with simulate_vinyl_artifacts
(/root/reference/src/utils/audio_processing.py:122-226), which is the
reference's measured training bottleneck: it runs scipy filtfilt three times
per item on the host, serialized with the GPU step (num_workers=0). Here the
whole degradation runs *inside the jitted train step*:

1. surface noise     — Gaussian, level ~ U(0.015, 0.03)
2. pops              — Poisson-timed impulses (rate/s), amp ~ U(0.1, 0.5),
                       polarity ±1 with p=(0.45, 0.55), exponential decay
                       1-3 ms (amp-scaled), 3-8 kHz resonant ringing
3. crackle           — Gaussian noise -> zero-phase highpass @2.5 kHz
4. rumble            — Gaussian noise -> zero-phase lowpass @100 Hz
5. bandwidth rolloff — zero-phase lowpass @ U(6, 8) kHz on the full mix

TPU-native filtering: scipy's filtfilt is a bidirectional IIR — a 2T-step
sequential scan per filter. Zero-phase Butterworth filtering is equivalent to
convolving with the (symmetric, rapidly decaying) impulse response of
filtfilt, so we precompute truncated FIR kernels on the host once per trace
and run 'same' convolutions on the MXU — O(T·K) fully-parallel work instead
of O(T) sequential steps. The exact IIR path (ops.filters.sosfiltfilt) remains
available via filter_mode='iir'.

Randomness: the reference draws unseeded numpy randomness per item
(audio_processing.py:154-220); here every draw comes from an explicit
jax.random key, so degradation is reproducible and shardable.
"""
from __future__ import annotations

import functools
import math
import numpy as np
import jax
import jax.numpy as jnp

from ..config import ArtifactConfig
from ..ops import conv1d, butter_sos, sosfiltfilt
from ..ops.filters import butter_bank, bank_index, bank_select


# --------------------------------------------------------------------- FIR
@functools.lru_cache(maxsize=64)
def zero_phase_fir(order: int, cutoff_hz: float, sample_rate: float,
                   btype: str, numtaps: int):
    """Truncated impulse response of sosfiltfilt (symmetric, zero-phase)."""
    from scipy import signal as _sig

    wn = cutoff_hz / (sample_rate / 2.0)
    sos = _sig.butter(order, wn, btype=btype, output="sos")
    pad = 8 * numtaps
    delta = np.zeros(2 * pad + 1, np.float64)
    delta[pad] = 1.0
    h = _sig.sosfiltfilt(sos, delta)
    half = numtaps // 2
    kernel = h[pad - half:pad + half + 1]
    return np.asarray(kernel, np.float32)


@functools.lru_cache(maxsize=8)
def zero_phase_fir_bank(order: int, f_lo: float, f_hi: float,
                        sample_rate: float, btype: str, numtaps: int,
                        num: int = 33):
    # cached as numpy — a jnp array built under a jit trace is a tracer
    return np.stack([
        zero_phase_fir(order, float(f), sample_rate, btype, numtaps)
        for f in np.linspace(f_lo, f_hi, num)
    ])


def _fir_same(x, kernel):
    """'same' convolution of [C, T] with a [K] kernel.

    Long kernels go through the frequency domain: a C_in=C_out=1 direct
    conv can't use the MXU, and XLA's scalar-loop lowering measured
    28 ms/step for the 2049-tap rumble filter in the profiled train step
    (vs <1 ms as an FFT product). Short kernels stay direct — cheaper than
    two full-length FFTs and bit-closer to the reference conv.
    """
    k = kernel.shape[0]
    if k > 192:  # 257-tap crackle: 3 ms/step direct vs <1 ms via FFT
        # the centered 'same' slice below assumes an odd kernel; an even k
        # would silently shift the FFT branch half a sample vs the direct path
        assert k % 2 == 1, f"_fir_same FFT branch requires odd kernel, got {k}"
        t = x.shape[-1]
        # next-pow2 >= t+k-1 (bit_length of an exact power of two would
        # DOUBLE the transform: 65536.bit_length() = 17)
        n = 1 << max(t + k - 2, 1).bit_length()  # static, linear conv
        y = jnp.fft.irfft(jnp.fft.rfft(x, n) * jnp.fft.rfft(kernel, n), n)
        # 'same' center of the full convolution (k is odd for all callers)
        return y[..., k // 2:k // 2 + t].astype(x.dtype)
    return conv1d(x[:, :, None], kernel[::-1][:, None, None],
                  padding=k // 2)[:, :, 0]


# --------------------------------------------------------------------- pops
def _make_pops(key, num_samples: int, sample_rate: int, cfg: ArtifactConfig,
               max_pops: int, dtype=jnp.float32, *, rate=None, amp_max=None):
    """Sum of Poisson-timed decaying impulses as a [T] track."""
    k_n, k_loc, k_amp, k_pol, k_decay, k_freq = jax.random.split(key, 6)
    duration = num_samples / sample_rate
    rate = cfg.impulse_rate if rate is None else rate
    expected = duration * rate
    num_pops = jnp.minimum(
        jax.random.poisson(k_n, jnp.asarray(expected, jnp.float32)), max_pops)

    # template length covers the longest decay: 3 ms * (1 + static amp bound)
    amp_bound = max(cfg.impulse_amplitude[1], 1.0)
    tmpl_len = int(math.ceil(
        sample_rate * 0.003 * (1.0 + amp_bound))) + 1

    if amp_max is None:
        amp_hi = cfg.impulse_amplitude[1]
    else:
        # traced adaptive override: clamp into [amp_lo, static template
        # bound] — above the bound the decay mask would truncate the
        # loudest pops mid-decay (a step discontinuity), and below amp_lo
        # jax.random.uniform would silently sample an INVERTED range
        amp_hi = jnp.clip(amp_max, cfg.impulse_amplitude[0] + 1e-6,
                          amp_bound)
    locs = jax.random.randint(k_loc, (max_pops,), 0, num_samples)
    amps = jax.random.uniform(k_amp, (max_pops,), dtype,
                              cfg.impulse_amplitude[0], amp_hi)
    polarity = jnp.where(
        jax.random.uniform(k_pol, (max_pops,)) < 0.45, -1.0, 1.0).astype(dtype)
    decay_time = jax.random.uniform(k_decay, (max_pops,), dtype,
                                    0.001, 0.003) * (1.0 + amps)
    res_freq = jax.random.uniform(k_freq, (max_pops,), dtype, 3000.0, 8000.0)

    active = (jnp.arange(max_pops) < num_pops).astype(dtype)

    n = jnp.arange(tmpl_len, dtype=dtype)  # [L]
    decay_len = jnp.floor(sample_rate * decay_time)  # [P]
    tau = sample_rate * decay_time * 0.3
    decay = jnp.exp(-n[None, :] / tau[:, None])  # [P, L]
    valid = (n[None, :] < decay_len[:, None]).astype(dtype)

    impulse = amps[:, None] * polarity[:, None] * decay
    t = n[None, :] / sample_rate
    resonance = 0.3 * jnp.sin(2 * jnp.pi * res_freq[:, None] * t) * decay
    # reference adds ringing only when the decay spans >10 samples
    ring_on = (decay_len > 10).astype(dtype)[:, None]
    impulse = impulse + resonance * amps[:, None] * 0.2 * ring_on
    impulse = impulse * valid * active[:, None]

    idx = locs[:, None] + jnp.arange(tmpl_len)[None, :]  # [P, L]
    track = jnp.zeros((num_samples + tmpl_len,), dtype)
    track = track.at[idx.reshape(-1)].add(impulse.reshape(-1))
    return track[:num_samples]


# ------------------------------------------------------------------- driver
def simulate_vinyl_artifacts(key, audio, sample_rate: int,
                             cfg: ArtifactConfig | None = None,
                             *, filter_mode: str = "fir",
                             max_pops: int | None = None,
                             overrides: dict | None = None):
    """Degrade clean audio with 78rpm artifacts.

    audio: [C, T] (or [T]) -> same shape. jit/vmap-safe; every random draw
    comes from `key`.

    `overrides` may carry *traced* per-item parameters learned from real
    recordings (the AdaptiveArtifactDataset path, mixed_dataset.py:288-308):
    'impulse_rate' (clipped to <=50/s by the dataset — max_pops covers it),
    'impulse_amplitude_max', 'noise_level' (scales surface noise to
    (0.5x, 1.5x) and crackle to (0.3x, 0.8x) of it).
    """
    cfg = cfg or ArtifactConfig()
    ov = overrides or {}
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    c, t = audio.shape
    dtype = audio.dtype
    if max_pops is None:
        # static bound; 50/s is the adaptive path's clip ceiling
        rate_bound = 50.0 if "impulse_rate" in ov else cfg.impulse_rate
        max_pops = int(math.ceil(3.0 * (t / sample_rate) * rate_bound)) + 16

    (k_surf_lvl, k_surf, k_pops, k_crackle_lvl, k_crackle, k_rumble_lvl,
     k_rumble, k_rolloff) = jax.random.split(key, 8)

    out = audio

    # 1. surface noise
    if "noise_level" in ov:
        nl = ov["noise_level"]
        lvl = jax.random.uniform(k_surf_lvl, (), dtype) * nl + 0.5 * nl
    else:
        lvl = jax.random.uniform(k_surf_lvl, (), dtype,
                                 cfg.surface_noise_level[0],
                                 cfg.surface_noise_level[1])
    out = out + jax.random.normal(k_surf, (c, t), dtype) * lvl

    # 2. pops (shared across channels, like the reference's [..., loc:] add)
    pop_rate = ov.get("impulse_rate", cfg.impulse_rate)
    pop_amp_max = ov.get("impulse_amplitude_max", cfg.impulse_amplitude[1])
    out = out + _make_pops(k_pops, t, sample_rate, cfg, max_pops, dtype,
                           rate=pop_rate, amp_max=pop_amp_max)[None]

    # 3. crackle: highpassed noise @2.5 kHz
    if "noise_level" in ov:
        nl = ov["noise_level"]
        lvl = jax.random.uniform(k_crackle_lvl, (), dtype) * (0.5 * nl) + 0.3 * nl
    else:
        lvl = jax.random.uniform(k_crackle_lvl, (), dtype,
                                 cfg.crackle_level[0], cfg.crackle_level[1])
    crackle = jax.random.normal(k_crackle, (c, t), dtype) * lvl
    out = out + _zero_phase(crackle, 4, 2500.0, sample_rate, "high",
                            filter_mode, numtaps=257)

    # 4. rumble: lowpassed noise @100 Hz (long FIR — slow filter)
    if cfg.add_rumble:
        lvl = jax.random.uniform(k_rumble_lvl, (), dtype,
                                 cfg.rumble_level[0], cfg.rumble_level[1])
        rumble = jax.random.normal(k_rumble, (c, t), dtype) * lvl
        out = out + _zero_phase(rumble, 4, 100.0, sample_rate, "low",
                                filter_mode, numtaps=2049)

    # 5. bandwidth roll-off @ U(6, 8) kHz on the full mix (random cutoff ->
    #    traced selection from a precomputed kernel/coefficient bank)
    if cfg.add_rolloff:
        freq = jax.random.uniform(k_rolloff, (), jnp.float32,
                                  cfg.rolloff_freq[0], cfg.rolloff_freq[1])
        f_lo, f_hi = cfg.rolloff_freq
        if filter_mode == "fir":
            # same 49-point grid + nearest-index rule as the IIR branch's
            # butter_bank/bank_select, so fir/iir modes quantize the drawn
            # cutoff identically and differ only by filter math
            bank = jnp.asarray(zero_phase_fir_bank(
                3, f_lo, f_hi, sample_rate, "low", 129, num=49))
            out = _fir_same(out, bank[bank_index(49, freq, f_lo, f_hi)])
        else:
            sos_bank = butter_bank(3, f_lo, f_hi, sample_rate, "low")
            sos, zi = bank_select(sos_bank, freq, f_lo, f_hi)
            out = sosfiltfilt(sos, out, zi=zi)

    return out[0] if squeeze else out


def _zero_phase(x, order, cutoff, sample_rate, btype, mode, numtaps):
    if mode == "fir":
        kernel = jnp.asarray(zero_phase_fir(order, cutoff, sample_rate,
                                            btype, numtaps))
        return _fir_same(x, kernel)
    sos, zi = butter_sos(order, cutoff, sample_rate, btype)
    return sosfiltfilt(jnp.asarray(sos), x, zi=jnp.asarray(zi))


def simulate_batch(key, batch, sample_rate: int,
                   cfg: ArtifactConfig | None = None, **kwargs):
    """vmap over [B, C, T] with a key per item."""
    keys = jax.random.split(key, batch.shape[0])
    fn = functools.partial(simulate_vinyl_artifacts, sample_rate=sample_rate,
                           cfg=cfg, **kwargs)
    return jax.vmap(fn)(keys, batch)

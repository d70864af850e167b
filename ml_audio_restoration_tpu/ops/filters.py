"""IIR filtering on TPU: Butterworth design + lfilter/filtfilt as scans.

The reference degrades audio with scipy.signal.butter + filtfilt on the host
CPU, three times per training item
(/root/reference/src/utils/audio_processing.py:192-224) — the measured
throughput bottleneck of its training loop. Here the *design* stage stays on
the host (static coefficients, computed once per jit trace via scipy), while
the *filtering* runs on-device as a `lax.scan` over time with the batch axis
vectorized, so artifact synthesis can live inside the jitted train step.

For the randomized roll-off cutoff (U(6,8) kHz per sample) we precompute a
coefficient bank over a cutoff grid and select with a traced index — XLA
needs static filter orders, not static cutoffs.

filtfilt reproduces scipy semantics: odd extension with
padlen = 3 * max(len(a), len(b)), lfilter_zi initial conditions scaled by the
first/last extended sample.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=64)
def butter_coeffs(order: int, cutoff_hz: float, sample_rate: float, btype: str):
    """Digital Butterworth (b, a, zi) as numpy arrays (host-side design)."""
    from scipy import signal as _sig

    wn = cutoff_hz / (sample_rate / 2.0)
    b, a = _sig.butter(order, wn, btype=btype)
    zi = _sig.lfilter_zi(b, a)
    return (
        np.asarray(b, np.float32),
        np.asarray(a, np.float32),
        np.asarray(zi, np.float32),
    )


@functools.lru_cache(maxsize=64)
def butter_sos(order: int, cutoff_hz: float, sample_rate: float, btype: str):
    """Butterworth as cascaded biquads (SOS) + per-section sosfilt_zi.

    SOS is the float32-stable form — low normalized cutoffs (the reference's
    100 Hz rumble filter) put transfer-function poles too close to the unit
    circle for single-section f32 filtering.

    Returns (sos [S, 6], zi [S, 2]) float32 numpy arrays.
    """
    from scipy import signal as _sig

    wn = cutoff_hz / (sample_rate / 2.0)
    sos = _sig.butter(order, wn, btype=btype, output="sos")
    zi = _sig.sosfilt_zi(sos)
    return np.asarray(sos, np.float32), np.asarray(zi, np.float32)


@functools.lru_cache(maxsize=8)
def butter_bank(order: int, f_lo: float, f_hi: float, sample_rate: float,
                btype: str, num: int = 49):
    """Stacked SOS (sos, zi) over a grid of cutoffs in [f_lo, f_hi] — lets a
    *traced* random cutoff select static-order filter coefficients under jit
    (the reference draws its roll-off cutoff U(6,8) kHz per sample,
    audio_processing.py:220). Cached as numpy (jnp under trace = tracer)."""
    soss, zis = [], []
    for f in np.linspace(f_lo, f_hi, num):
        sos, zi = butter_sos(order, float(f), sample_rate, btype)
        soss.append(sos)
        zis.append(zi)
    return np.stack(soss), np.stack(zis)


def bank_index(num: int, freq, f_lo: float, f_hi: float):
    """Nearest grid index for a (traced) cutoff over a `num`-point linspace
    in [f_lo, f_hi] — the one quantization rule every coefficient bank
    (SOS and FIR) shares."""
    return jnp.clip(
        jnp.round((freq - f_lo) / (f_hi - f_lo) * (num - 1)).astype(jnp.int32),
        0,
        num - 1,
    )


def bank_select(bank, freq, f_lo: float, f_hi: float):
    """Pick the nearest bank entry for a (traced) cutoff frequency."""
    soss, zis = jnp.asarray(bank[0]), jnp.asarray(bank[1])
    idx = bank_index(soss.shape[0], freq, f_lo, f_hi)
    return soss[idx], zis[idx]


def sosfilt(sos, x, zi=None):
    """Cascaded-biquad IIR along the last axis of [..., T].

    sos: [S, 6] second-order sections; zi: optional [S, 2] per-section initial
    conditions (broadcast over leading axes, scipy sosfilt convention).
    """
    sos = jnp.asarray(sos)
    n_sections = sos.shape[0]
    lead = x.shape[:-1]
    if zi is None:
        z0 = jnp.zeros(lead + (n_sections, 2), x.dtype)
    else:
        z0 = jnp.broadcast_to(zi, lead + (n_sections, 2)).astype(x.dtype)

    def step(z, xt):
        zs = []
        y = xt
        for s in range(n_sections):  # static unroll over sections (S <= 3)
            b0, b1, b2, _a0, a1, a2 = [sos[s, i] for i in range(6)]
            out = b0 * y + z[..., s, 0]
            z0_new = b1 * y - a1 * out + z[..., s, 1]
            z1_new = b2 * y - a2 * out
            zs.append(jnp.stack([z0_new, z1_new], axis=-1))
            y = out
        return jnp.stack(zs, axis=-2), y

    z_final, y = lax.scan(step, z0, jnp.moveaxis(x, -1, 0), unroll=4)
    del z_final
    return jnp.moveaxis(y, 0, -1)


def sosfiltfilt(sos, x, zi=None, padlen: int | None = None):
    """Zero-phase forward-backward SOS filtering matching
    scipy.signal.sosfiltfilt defaults."""
    sos = jnp.asarray(sos)
    n_sections = sos.shape[0]
    if padlen is None:
        padlen = 3 * (2 * n_sections + 1)
    if zi is None:
        raise ValueError("pass zi from butter_sos / scipy.signal.sosfilt_zi")
    if x.shape[-1] <= padlen:
        # scipy raises here too; the odd-extension slices below would
        # silently produce short/empty output otherwise
        raise ValueError(
            f"input length {x.shape[-1]} must exceed padlen {padlen}")
    zi = jnp.asarray(zi)

    left = 2 * x[..., :1] - x[..., padlen:0:-1]
    right = 2 * x[..., -1:] - x[..., -2:-padlen - 2:-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    y = sosfilt(sos, ext, zi=zi * ext[..., 0][..., None, None])
    y = y[..., ::-1]
    y = sosfilt(sos, y, zi=zi * y[..., 0][..., None, None])
    y = y[..., ::-1]
    return y[..., padlen:-padlen]


def lfilter(b, a, x, zi=None):
    """Direct-form-II-transposed IIR filter along the last axis of [..., T].

    b, a: [order+1] (a[0] must be 1 after normalization — enforced here).
    zi: optional [order] initial conditions (broadcast over leading axes).
    """
    b = jnp.asarray(b)
    a = jnp.asarray(a)
    b = b / a[0]
    a = a / a[0]
    order = a.shape[0] - 1
    lead = x.shape[:-1]
    if zi is None:
        z0 = jnp.zeros(lead + (order,), x.dtype)
    else:
        z0 = jnp.broadcast_to(zi, lead + (order,)).astype(x.dtype)

    b_taps = b[1:]
    a_taps = a[1:]

    def step(z, xt):
        # xt: [...], z: [..., order]
        y = b[0] * xt + z[..., 0]
        xt_e = xt[..., None]
        y_e = y[..., None]
        z_shift = jnp.concatenate(
            [z[..., 1:], jnp.zeros(lead + (1,), x.dtype)], axis=-1
        )
        z_new = z_shift + b_taps * xt_e - a_taps * y_e
        return z_new, y

    _, y = lax.scan(step, z0, jnp.moveaxis(x, -1, 0), unroll=4)
    return jnp.moveaxis(y, 0, -1)


def filtfilt(b, a, x, zi=None, padlen: int | None = None):
    """Zero-phase forward-backward filtering matching scipy.signal.filtfilt
    defaults (odd extension, padlen = 3*max(len(a), len(b)))."""
    b = jnp.asarray(b)
    a = jnp.asarray(a)
    if padlen is None:
        padlen = 3 * max(b.shape[0], a.shape[0])
    if x.shape[-1] <= padlen:
        raise ValueError(
            f"input length {x.shape[-1]} must exceed padlen {padlen}")
    if zi is None:
        zi = _lfilter_zi_jnp(b, a)

    # Odd extension at both ends.
    left = 2 * x[..., :1] - x[..., padlen:0:-1]
    right = 2 * x[..., -1:] - x[..., -2:-padlen - 2:-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    y = lfilter(b, a, ext, zi=zi * ext[..., :1])
    y = y[..., ::-1]
    y = lfilter(b, a, y, zi=zi * y[..., :1])
    y = y[..., ::-1]
    return y[..., padlen:-padlen]


def _lfilter_zi_jnp(b, a):
    """lfilter_zi for traced coefficients (solve the steady-state system)."""
    b = b / a[0]
    a = a / a[0]
    n = a.shape[0]
    eye = jnp.eye(n - 1, dtype=b.dtype)
    companion_t = jnp.zeros((n - 1, n - 1), b.dtype)
    companion_t = companion_t.at[:, 0].set(-a[1:])
    companion_t = companion_t.at[:-1, 1:].set(jnp.eye(n - 2, dtype=b.dtype))
    iminus = eye - companion_t
    rhs = b[1:] - a[1:] * b[0]
    return jnp.linalg.solve(iminus, rhs)


def butter_filtfilt(x, order: int, cutoff_hz: float, sample_rate: float,
                    btype: str):
    """Convenience: scipy-designed Butterworth + on-device zero-phase filter
    (static cutoff — the crackle highpass @2.5 kHz and rumble lowpass @100 Hz
    cases). Uses the SOS form for float32 stability."""
    sos, zi = butter_sos(order, cutoff_hz, sample_rate, btype)
    return sosfiltfilt(jnp.asarray(sos), x, zi=jnp.asarray(zi))

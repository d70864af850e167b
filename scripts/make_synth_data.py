#!/usr/bin/env python
"""Generate the synthetic music-like training corpus used by docs/RESULTS.md.

This environment ships no real audio, so training/eval corpora are
synthesized: dense harmonic note stacks (band-limited to Nyquist) over a
pink-noise bed with percussive onsets — broadband enough to avoid the
log-STFT silence optimum documented in docs/RESULTS.md ("Notes").

The reference trains on real recordings fetched by its data-scraper; this
script stands in for that corpus so every number in RESULTS.md is
reproducible from the repo alone:

    python scripts/make_synth_data.py --out data/train22 --n 400 --rate 22050
    python scripts/make_synth_data.py --out data/eval22  --n 20  --rate 22050 --seed 9
    python scripts/make_synth_data.py --out data/train44 --n 200 --rate 44100
    python scripts/make_synth_data.py --out data/stereo22 --n 200 --rate 22050 --stereo

Deterministic per (seed, file index).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ml_audio_restoration_tpu.audio import save_audio  # noqa: E402

# pentatonic-ish pitch pool (Hz) spanning ~4 octaves
_F0_POOL = np.array([82.4, 98.0, 110.0, 130.8, 146.8, 164.8, 196.0, 220.0,
                     261.6, 293.7, 329.6, 392.0, 440.0, 523.3, 587.3, 659.3,
                     784.0, 880.0, 1046.5])


def _pink_noise(rng, n):
    """1/f-shaped noise via rFFT weighting."""
    spec = rng.normal(size=n // 2 + 1) + 1j * rng.normal(size=n // 2 + 1)
    freqs = np.maximum(np.fft.rfftfreq(n), 1.0 / n)
    spec = spec / np.sqrt(freqs)
    x = np.fft.irfft(spec, n=n)
    return (x / (np.std(x) + 1e-12)).astype(np.float32)


def _note(rng, rate, dur_s, f0):
    """Band-limited harmonic stack with AD envelope. Returns [T]."""
    t = np.arange(int(dur_s * rate), dtype=np.float32) / rate
    nyq = rate / 2
    n_harm = int(min(nyq * 0.95 / f0, 60))
    k = np.arange(1, n_harm + 1, dtype=np.float32)
    amps = (k ** -rng.uniform(0.8, 1.6)).astype(np.float32)
    amps *= rng.uniform(0.5, 1.0, size=n_harm).astype(np.float32)
    phases = rng.uniform(0, 2 * np.pi, size=n_harm).astype(np.float32)
    # [K, T] additive synthesis — the dominant cost, vectorized
    wave = (amps[:, None] *
            np.sin(2 * np.pi * f0 * k[:, None] * t[None, :]
                   + phases[:, None])).sum(axis=0)
    attack = max(int(0.01 * rate), 1)
    env = np.ones_like(t)
    env[:attack] = np.linspace(0, 1, attack)
    env *= np.exp(-t / rng.uniform(0.8, 3.0))
    return (wave * env).astype(np.float32)


def _percussion(rng, rate, n):
    """Short decaying noise burst (drum-ish onset). Returns [n]."""
    burst = rng.normal(size=n).astype(np.float32)
    decay = np.exp(-np.arange(n, dtype=np.float32) / (0.01 * rate))
    return burst * decay


def music_like(rng, seconds: float, rate: int, stereo: bool = False):
    """Synthesize one clip. Returns [C, T] float32 at ~-20 dB RMS."""
    n = int(seconds * rate)
    ch = 2 if stereo else 1
    out = np.zeros((ch, n), np.float32)

    # pink-noise bed: common component + (stereo) small independent part
    bed = _pink_noise(rng, n) * 0.02
    for c in range(ch):
        out[c] += bed
        if stereo:
            out[c] += _pink_noise(rng, n) * 0.006

    n_notes = rng.integers(10, 18)
    for _ in range(n_notes):
        f0 = float(rng.choice(_F0_POOL)) * float(rng.choice([0.5, 1.0, 1.0, 2.0]))
        dur = float(rng.uniform(0.4, 2.5))
        start = int(rng.uniform(0, max(seconds - dur, 0.05)) * rate)
        note = _note(rng, rate, dur, f0) * rng.uniform(0.1, 0.4)
        end = min(start + note.shape[0], n)
        seg = note[: end - start]
        if stereo:
            pan = rng.uniform(0, np.pi / 2)  # constant-power
            out[0, start:end] += seg * np.cos(pan)
            out[1, start:end] += seg * np.sin(pan)
        else:
            out[0, start:end] += seg
        if rng.random() < 0.6:  # percussive onset
            pn = min(int(0.04 * rate), n - start)
            perc = _percussion(rng, rate, pn) * rng.uniform(0.05, 0.2)
            out[:, start:start + pn] += perc[None]

    rms = np.sqrt(np.mean(out ** 2)) + 1e-12
    out *= 10 ** (-20 / 20) / rms
    peak = np.abs(out).max()
    if peak > 0.99:
        out *= 0.99 / peak
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--rate", type=int, default=22050)
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(args.n):
        rng = np.random.default_rng((args.seed, i))
        clip = music_like(rng, args.seconds, args.rate, args.stereo)
        save_audio(out_dir / f"clip_{i:04d}.wav", clip, args.rate)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{args.n}")
    print(f"wrote {args.n} files to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

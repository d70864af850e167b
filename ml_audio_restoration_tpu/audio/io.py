"""Audio load/save/normalize/resample — parity layer over the codec.

Semantics mirror /root/reference/src/utils/audio_processing.py:10-119:
- load_audio: read -> [channels, samples] float32, optional mono mixdown
  (mean over channels), resample to the target rate.
- save_audio: [channels, samples] -> file (PCM_16 like torchaudio.save).
- normalize_audio: RMS-normalize to target dB (-20 default) with a
  peak-clip guard.
- add_noise / apply_highpass_filter: augmentation helpers.

Resampling uses a polyphase windowed-sinc (Kaiser) FIR, the standard
high-quality resampler (scipy.signal.resample_poly), run on host — file I/O
is host-side anyway; on-device resampling for fixed x2 ratios lives in
ops/interp.py.
"""
from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from .wav import read_wav, write_wav, wav_info
from .flac import read_flac, write_flac, flac_info

AUDIO_EXTENSIONS = (".wav", ".mp3", ".flac", ".ogg")


def _read_any(path, start: int = 0, frames: int = -1):
    """Dispatch on extension. WAV and FLAC decode through the C++ codec when
    built (native/wavio.cpp + flacio.cpp, bit-identical to the numpy/Python
    paths), else through the pure-Python codecs; mp3/ogg decode through the
    system codec libraries (audio/codecs.py) when present."""
    path = str(path)
    low = path.lower()
    if low.endswith((".wav", ".flac")):
        from . import native

        res = native.read(path, start=start, frames=frames)
        if res is not None:
            return res
        if low.endswith(".flac"):
            return read_flac(path, start=start, frames=frames)
        return read_wav(path, start=start, frames=frames)
    from . import codecs

    res = codecs.read(path, start=start, frames=frames)
    if res is not None:
        return res
    raise ValueError(
        f"cannot decode {path!r}: wav/flac are supported natively; mp3/ogg "
        "need the system libmpg123/libvorbisfile (not found)")


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample along the last axis of [C, T]."""
    if orig_sr == target_sr:
        return audio
    from scipy.signal import resample_poly

    g = math.gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g,
                         axis=-1).astype(np.float32)


def load_audio(path, sample_rate: int | None = 22050, mono: bool = True):
    """-> (float32 [channels, samples], sample_rate).

    sample_rate=None keeps the file's native rate (no resample).
    """
    data, sr = _read_any(path)
    audio = data.T.astype(np.float32)  # [C, T]
    if mono and audio.shape[0] > 1:
        audio = audio.mean(axis=0, keepdims=True)
    if sample_rate is not None and sr != sample_rate:
        audio = resample(audio, sr, sample_rate)
        sr = sample_rate
    return audio, sr


def load_audio_chunk(path, chunk_size: int, rng: np.random.Generator,
                     sample_rate: int = 22050, mono: bool = True,
                     resample_chunks: bool = False):
    """Seek-read one random chunk (reference preprocessing.py:64-87):
    if the file is longer than `chunk_size` frames, decode only a random
    window; otherwise load + resample the whole file. WAV seeks are O(1);
    FLAC seeks ride the SEEKTABLE (or skip-decode) in the codec.

    Reproduced upstream quirk (preprocessing.py:64-80, PARITY.md "Known
    upstream quirks"): the seek path returns the chunk at the FILE's native
    rate — a 44.1 kHz file in a 22.05 kHz corpus silently yields wrong-rate
    chunks. Default keeps that behavior (with a warning on mismatch);
    `resample_chunks=True` reads a rate-scaled window and resamples it to
    `chunk_size` frames at `sample_rate`.
    """
    p = str(path)
    low = p.lower()
    if low.endswith((".wav", ".flac")):
        info = wav_info(p) if low.endswith(".wav") else flac_info(p)
        file_sr = info.sample_rate
        # frames to read at the file's native rate for chunk_size output
        # frames at the requested rate
        read_frames = (chunk_size if file_sr == sample_rate or not
                       resample_chunks
                       else -(-chunk_size * file_sr // sample_rate))
        if info.frames > read_frames:
            if file_sr != sample_rate and not resample_chunks:
                # warn only when the seek path actually returns a
                # native-rate chunk (short files fall through to
                # load_audio, which resamples correctly)
                import warnings

                warnings.warn(
                    f"{p}: file rate {file_sr} != requested {sample_rate}; "
                    f"seek-read chunk keeps the native rate "
                    f"(reference-parity behavior — pass resample_chunks="
                    f"True to resample)", stacklevel=2)
            start = int(rng.integers(0, info.frames - read_frames + 1))
            data, _sr = _read_any(p, start=start, frames=read_frames)
            audio = data.T.astype(np.float32)
            if mono and audio.shape[0] > 1:
                audio = audio.mean(axis=0, keepdims=True)
            if file_sr != sample_rate and resample_chunks:
                audio = resample(audio, file_sr, sample_rate)
                audio = audio[:, :chunk_size]
            return audio
    # mp3/ogg (no cheap frame-count probe) and short wav/flac: decode the
    # whole file, then take a RANDOM window — the dataset caller crops to
    # the chunk size, and without randomizing here a long mp3/ogg corpus
    # would train on the first chunk of every file, every epoch
    # (reference preprocessing.py:64-87 random-chunks these too)
    audio, _ = load_audio(p, sample_rate, mono=mono)
    if audio.shape[-1] > chunk_size:
        start = int(rng.integers(0, audio.shape[-1] - chunk_size + 1))
        audio = audio[:, start:start + chunk_size]
    return audio


def save_audio(path, audio: np.ndarray, sample_rate: int = 22050,
               subtype: str = "PCM_16"):
    """audio: [channels, samples] -> file. Container follows the
    extension: .flac -> FLAC, .mp3/.ogg -> the system encoders
    (audio/codecs.py; raises when their libraries are absent — silently
    writing RIFF bytes into an .mp3 would produce a file load_audio then
    refuses to read), anything else -> WAV."""
    audio = np.asarray(audio, np.float32)
    low = str(path).lower()
    if low.endswith(".flac"):
        bits = 24 if subtype == "PCM_24" else 16
        write_flac(path, audio.T, sample_rate, bits=bits)
        return
    if low.endswith((".mp3", ".ogg")):
        from . import codecs

        writer = codecs.write_mp3 if low.endswith(".mp3") else codecs.write_ogg
        if writer(path, audio.T, sample_rate):
            return
        raise ValueError(
            f"cannot encode {path!r}: the system "
            f"{'lame' if low.endswith('.mp3') else 'vorbis'} encoder is "
            f"unavailable — save as .wav/.flac instead")
    write_wav(path, audio.T, sample_rate, subtype=subtype)


def normalize_audio(audio, target_db: float = -20.0):
    """RMS-normalize to target dB with peak-clip guard
    (audio_processing.py:58-87). Works on numpy or jnp arrays."""
    xp = np
    if type(audio).__module__.startswith("jax"):
        import jax.numpy as xp  # noqa: F811

    rms = xp.sqrt(xp.mean(audio**2))
    target_rms = 10.0 ** (target_db / 20.0)
    gain = xp.where(rms == 0, 1.0, target_rms / xp.maximum(rms, 1e-12))
    normalized = audio * gain
    peak = xp.max(xp.abs(normalized))
    return xp.where(peak > 1.0, normalized / peak, normalized)


def add_noise(audio, noise_level: float = 0.01, rng=None):
    rng = rng or np.random.default_rng()
    return audio + rng.normal(0, noise_level, audio.shape).astype(np.float32)


def apply_highpass_filter(audio, sample_rate: int, cutoff_freq: float = 80.0):
    """Biquad highpass (rumble removal), matching torchaudio.transforms
    .Highpass semantics (Q=0.707 RBJ biquad)."""
    from scipy.signal import lfilter

    w0 = 2 * math.pi * cutoff_freq / sample_rate
    q = 0.707
    alpha = math.sin(w0) / (2 * q)
    cosw = math.cos(w0)
    b = np.array([(1 + cosw) / 2, -(1 + cosw), (1 + cosw) / 2])
    a = np.array([1 + alpha, -2 * cosw, 1 - alpha])
    return lfilter(b / a[0], a / a[0], audio, axis=-1).astype(np.float32)


def find_audio_files(directory, extensions=AUDIO_EXTENSIONS, recursive=True):
    directory = Path(directory)
    pattern = "**/*" if recursive else "*"
    return sorted(
        p for p in directory.glob(pattern)
        if p.suffix.lower() in extensions and p.is_file()
    )

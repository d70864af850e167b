"""Dataset stack: host-side chunk readers feeding on-device degradation.

Capability parity with the reference datasets
(/root/reference/src/utils/preprocessing.py:9-213,
train_super_resolution.py:18-70, mixed_dataset.py:16-310) with one deliberate
architectural change: the reference degrades audio on the host inside
__getitem__ (scipy filtfilt x3 per item — its throughput bottleneck); here
datasets yield *clean* chunks and the artifact simulation runs on-device
inside the jitted train step (data/artifacts.py). Each dataset declares how
the train step should derive (input, target) from its batches.

All datasets yield numpy [C, chunk] float32, normalized to -20 dB RMS and
zero-padded to the chunk size, using seek-based partial reads for long files.
"""
from __future__ import annotations

from pathlib import Path
import numpy as np

from ..audio import (
    load_audio,
    load_audio_chunk,
    normalize_audio,
    find_audio_files,
)


class ChunkDataset:
    """Base: one random chunk per file per epoch (preprocessing.py:64-87)."""

    #: how the train step builds (input, target) from a batch:
    #: 'degrade' | 'mono_target_stereo' | 'downsample' | 'mixed'
    pairing = "degrade"

    def __init__(self, data_dir, sample_rate: int = 22050,
                 chunk_duration: float = 2.0, mono: bool = True,
                 extensions=None, seed: int = 0,
                 resample_chunks: bool = False):
        self.data_dir = Path(data_dir)
        self.sample_rate = sample_rate
        self.chunk_size = int(sample_rate * chunk_duration)
        self.mono = mono
        # opt-in fix for the reproduced upstream seek-path quirk: a file
        # whose native rate differs from `sample_rate` yields native-rate
        # chunks (with a warning) unless this is True — then the window is
        # rate-scaled and resampled (audio/io.py::load_audio_chunk)
        self.resample_chunks = resample_chunks
        self.files = find_audio_files(
            self.data_dir,
            extensions=extensions or (".wav", ".mp3", ".flac", ".ogg"))
        if not self.files:
            raise ValueError(f"No audio files found in {data_dir}")
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.files)

    def _chunk(self, path, mono=None):
        audio = load_audio_chunk(path, self.chunk_size, self.rng,
                                 self.sample_rate,
                                 mono=self.mono if mono is None else mono,
                                 resample_chunks=self.resample_chunks)
        audio = np.asarray(normalize_audio(audio), np.float32)
        if audio.shape[-1] < self.chunk_size:
            audio = np.pad(audio,
                           ((0, 0), (0, self.chunk_size - audio.shape[-1])))
        return audio[:, :self.chunk_size]

    def __getitem__(self, idx):
        raise NotImplementedError


class _MonoBatchReadMixin:
    """Parallel native batch decode for mono chunk datasets — one ctypes call
    decodes the whole batch across a C++ thread pool (DataLoader uses
    `getitems` when present). Falls back to per-item __getitem__ when the
    native library or WAV-only file set is unavailable."""

    _batch_key = "clean"

    def getitems(self, indices, threads: int = 8):
        from ..audio import native

        paths = [self.files[i] for i in indices]
        if not native.available() or not all(
                str(p).lower().endswith((".wav", ".flac")) for p in paths):
            return [self[i] for i in indices]
        starts = []
        lengths = []
        for p in paths:
            meta = native.info(p)
            if meta is None or meta["sample_rate"] != self.sample_rate:
                return [self[i] for i in indices]
            max_start = max(meta["frames"] - self.chunk_size, 0)
            starts.append(int(self.rng.integers(0, max_start + 1)))
            lengths.append(min(meta["frames"], self.chunk_size))
        batch = native.read_batch_mono(paths, starts, self.chunk_size,
                                       threads=threads)
        if batch is None:
            return [self[i] for i in indices]
        # -20 dB RMS normalize + clip guard, vectorized over the batch.
        # RMS over each row's TRUE decoded length: files shorter than the
        # chunk are zero-padded by read_batch_mono, and averaging the pad
        # into the RMS would over-amplify them relative to the per-item
        # path (_chunk normalizes BEFORE padding).
        lens = np.maximum(np.asarray(lengths, np.float32)[:, None], 1.0)
        rms = np.sqrt(np.sum(batch**2, axis=1, keepdims=True) / lens)
        gain = np.where(rms == 0, 1.0, 10 ** (-20 / 20) / np.maximum(rms, 1e-12))
        batch = batch * gain
        peak = np.max(np.abs(batch), axis=1, keepdims=True)
        batch = np.where(peak > 1.0, batch / np.maximum(peak, 1e-12), batch)
        return [{self._batch_key: row[None].astype(np.float32)}
                for row in batch]


class RestorationDataset(_MonoBatchReadMixin, ChunkDataset):
    """Clean mono chunks; the train step degrades them on-device
    (replaces AudioRestorationDataset, preprocessing.py:9-111)."""

    pairing = "degrade"

    def __init__(self, data_dir, sample_rate: int = 22050,
                 chunk_duration: float = 2.0, add_artifacts: bool = True,
                 **kw):
        super().__init__(data_dir, sample_rate, chunk_duration, mono=True,
                         **kw)
        self.add_artifacts = add_artifacts
        if not add_artifacts:
            self.pairing = "identity"

    def __getitem__(self, idx):
        return {"clean": self._chunk(self.files[idx])}


class StereoDataset(ChunkDataset):
    """Stereo targets; mono input is derived as the channel mean
    (replaces StereoDataset, preprocessing.py:114-213)."""

    pairing = "mono_target_stereo"

    def __init__(self, data_dir, sample_rate: int = 22050,
                 chunk_duration: float = 2.0, **kw):
        super().__init__(data_dir, sample_rate, chunk_duration, mono=False,
                         extensions=(".wav", ".flac"), **kw)

    def __getitem__(self, idx):
        audio = self._chunk(self.files[idx], mono=False)
        if audio.shape[0] == 1:
            audio = np.repeat(audio, 2, axis=0)
        elif audio.shape[0] > 2:
            audio = audio[:2]
        return {"stereo": audio}


class SuperResolutionDataset(ChunkDataset):
    """High-rate chunks; the train step derives the low-rate input with the
    same align_corners=False linear downsample the reference uses
    (train_super_resolution.py:47-70)."""

    pairing = "downsample"

    def __init__(self, data_dir, low_sample_rate: int = 22050,
                 high_sample_rate: int = 44100, chunk_duration: float = 2.0,
                 **kw):
        super().__init__(data_dir, high_sample_rate, chunk_duration,
                         mono=True, extensions=(".wav", ".flac"), **kw)
        self.low_sample_rate = low_sample_rate
        self.low_chunk_size = int(low_sample_rate * chunk_duration)

    def __getitem__(self, idx):
        return {"high": self._chunk(self.files[idx])}


class MixedRestorationDataset(ChunkDataset):
    """Synthetic-vs-real mix for semi-supervised training
    (replaces MixedRestorationDataset, mixed_dataset.py:16-164).

    Yields {'audio', 'is_synthetic'}: synthetic items carry *clean* audio
    (degraded on-device; its clean source is the target); real items carry
    the degraded recording itself (no target — consistency loss applies).
    """

    pairing = "mixed"

    def __init__(self, clean_data_dir, degraded_data_dir=None,
                 sample_rate: int = 22050, chunk_duration: float = 2.0,
                 synthetic_ratio: float = 0.7, use_contrastive: bool = False,
                 **kw):
        super().__init__(clean_data_dir, sample_rate, chunk_duration,
                         mono=True, **kw)
        self.degraded_files = []
        if degraded_data_dir and Path(degraded_data_dir).is_dir():
            self.degraded_files = find_audio_files(
                degraded_data_dir, extensions=(".wav", ".mp3", ".flac"))
        total = len(self.files)
        if self.degraded_files:
            self.num_synthetic = int(total * synthetic_ratio)
        else:
            self.num_synthetic = total
        self.use_contrastive = use_contrastive and bool(self.degraded_files)

    def __getitem__(self, idx):
        use_synthetic = (not self.degraded_files) or idx < self.num_synthetic
        if use_synthetic:
            item = {
                "audio": self._chunk(self.files[idx % len(self.files)]),
                "is_synthetic": np.float32(1.0),
            }
        else:
            real_idx = (idx - self.num_synthetic) % len(self.degraded_files)
            item = {
                "audio": self._chunk(self.degraded_files[real_idx]),
                "is_synthetic": np.float32(0.0),
            }
        if self.use_contrastive:
            # pair each item with opposite-type audio for the contrastive
            # loss (mixed_dataset.py:143-157; label 0 = different type).
            # Synthetic pairs carry CLEAN audio — on-device degradation in
            # the train step makes them synthetic-type.
            if use_synthetic:
                j = int(self.rng.integers(0, len(self.degraded_files)))
                item["contrastive_pair"] = self._chunk(self.degraded_files[j])
                item["contrastive_pair_is_synthetic"] = np.float32(0.0)
            else:
                j = int(self.rng.integers(0, len(self.files)))
                item["contrastive_pair"] = self._chunk(self.files[j])
                item["contrastive_pair_is_synthetic"] = np.float32(1.0)
            item["contrastive_label"] = np.float32(0.0)
        return item


class AdaptiveArtifactDataset(ChunkDataset):
    """Learns artifact statistics from real 78rpm recordings and yields
    per-item degradation parameters alongside clean chunks
    (replaces AdaptiveArtifactDataset, mixed_dataset.py:167-310). The traced
    per-item parameters flow into the on-device simulator."""

    pairing = "degrade_adaptive"

    def __init__(self, clean_data_dir, reference_degraded_dir,
                 sample_rate: int = 22050, chunk_duration: float = 2.0,
                 analyze_every: int = 100, **kw):
        super().__init__(clean_data_dir, sample_rate, chunk_duration,
                         mono=True, **kw)
        self.degraded_files = find_audio_files(
            reference_degraded_dir, extensions=(".wav", ".mp3", ".flac"))
        if not self.degraded_files:
            raise ValueError(
                f"No reference recordings in {reference_degraded_dir}")
        self.analyze_every = analyze_every
        self._counter = 0
        self._epoch = 0
        self._hook_used = False
        self.artifact_params = self._analyze_real_artifacts()

    def _analyze_real_artifacts(self):
        """Impulse rate / amplitude / noise floor from sampled real files
        (mixed_dataset.py:210-259)."""
        from ..audio.analyze import detect_impulses_analytical

        rates, amps, noise_levels = [], [], []
        num = min(5, len(self.degraded_files))
        picks = self.rng.choice(len(self.degraded_files), num, replace=False)
        for i in picks:
            audio, _ = load_audio(self.degraded_files[i], self.sample_rate,
                                  mono=True)
            _, amplitudes, stats = detect_impulses_analytical(
                audio, self.sample_rate)
            if stats["num_impulses"] > 0:
                rates.append(stats["impulses_per_second"])
                amps.append(stats["max_amplitude"])
            flat = audio.reshape(-1)
            thresh = np.percentile(np.abs(flat), 10)
            quiet = flat[np.abs(flat) < thresh]
            if quiet.size:
                noise_levels.append(float(np.std(quiet)))
        return {
            "impulse_rate": float(np.mean(rates)) if rates else 10.0,
            "impulse_rate_std": float(np.std(rates)) if len(rates) > 1 else 5.0,
            "impulse_amplitude_max": float(np.mean(amps)) if amps else 0.5,
            "noise_level": float(np.mean(noise_levels)) if noise_levels else 0.02,
            "noise_level_std": (float(np.std(noise_levels))
                                if len(noise_levels) > 1 else 0.01),
        }

    def on_epoch_end(self):
        """Per-epoch re-analysis hook, matching the reference's epoch-driven
        schedule (mixed_dataset.py:267-270). The Trainer calls this after
        every epoch; the item-counter fallback below only fires when the
        dataset is consumed outside the Trainer."""
        self._hook_used = True
        self._epoch += 1
        if self._epoch % self.analyze_every == 0:
            self.artifact_params = self._analyze_real_artifacts()

    def __getitem__(self, idx):
        if not self._hook_used:
            self._counter += 1
            if self._counter >= self.analyze_every * len(self):
                self.artifact_params = self._analyze_real_artifacts()
                self._counter = 0

        p = self.artifact_params
        rate = float(np.clip(self.rng.normal(p["impulse_rate"],
                                             p["impulse_rate_std"]),
                             1.0, 50.0))
        noise = float(np.clip(self.rng.normal(p["noise_level"],
                                              p["noise_level_std"]),
                              0.005, 0.1))
        return {
            "clean": self._chunk(self.files[idx]),
            "impulse_rate": np.float32(rate),
            "impulse_amplitude_max": np.float32(p["impulse_amplitude_max"]),
            "noise_level": np.float32(noise),
        }

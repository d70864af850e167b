"""Quality-regression gates for the TRAINING stack (VERDICT r03 item 4).

Everything else in the suite guards training MECHANICS (steps run, loss
decreases, checkpoints roundtrip); nothing guarded training QUALITY — a
loss-weight or artifact-simulation regression would have passed all 387
round-3 tests. These gates train from scratch on a fixed-seed synthetic
corpus for a couple of CPU-minutes and assert the trained models actually
RESTORE on held-out audio:

- denoiser (fidelity loss, the config/denoiser_fidelity.yaml weights):
  restored beats degraded on SI-SDR (the scale-robust waveform SNR; plain
  SNR at this budget is gain-dominated — docs/RESULTS.md), multiscale
  spectral loss, and log-spectral distance;
- super-resolution: beats the linear-interpolation LSD baseline on a
  held-out harmonic stack — the model must CREATE harmonics above the
  low-rate Nyquist, which interpolation cannot (the actual SR task,
  reference src/models/super_resolution.py).

Margins were calibrated across seeds in the suite's own 8-virtual-device
CPU env (2026-08-20): denoiser SI-SDR improvement +0.78..+1.87 dB
(gate: >+0.3), spec -9..-24% (gate: -5%), LSD -9..-19 dB (gate: -5);
SR LSD margin vs linear -1.2..-4.2 dB (gate: -0.5). Protects
train/trainer.py loss semantics (reference src/training/trainer.py:70-79)
and data/artifacts.py.
"""
import os
import tempfile

import numpy as np
import pytest
import jax

from ml_audio_restoration_tpu.audio import save_audio
from ml_audio_restoration_tpu.config import (
    ArtifactConfig, PipelineConfig, TrainConfig)
from ml_audio_restoration_tpu.data.loader import DataLoader
from ml_audio_restoration_tpu.evaluate import (
    evaluate_denoiser, evaluate_super_resolution)
from ml_audio_restoration_tpu.models import denoiser, super_resolution
from ml_audio_restoration_tpu.pipeline import RestorationPipeline
from ml_audio_restoration_tpu.train.trainer import Trainer

SR = 22050
HR = 44100
CHUNK = 2048


def _tone_clip(rng, n, sr):
    """Dense 4-tone mix with slow AM — the denoiser corpus."""
    t = np.arange(n) / sr
    x = np.zeros(n, np.float32)
    for _ in range(4):
        f = rng.uniform(80, sr * 0.45)
        x += rng.uniform(0.05, 0.3) * np.sin(
            2 * np.pi * f * t + rng.uniform(0, 6.28))
    x *= (1.0 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t)
          ).astype(np.float32)
    return (0.5 * x / max(1e-6, np.abs(x).max())).astype(np.float32)


def _harm_clip(rng, n, sr):
    """Full harmonic stack (1/k amplitudes up to 0.45*sr): the top octave
    is a deterministic function of the audible fundamental, so
    super-resolution is learnable while linear interpolation physically
    cannot reconstruct it."""
    t = np.arange(n) / sr
    f0 = rng.uniform(150, 400)
    x = np.zeros(n, np.float32)
    k = 1
    while k * f0 < sr * 0.45:
        x += (1.0 / k) * np.sin(2 * np.pi * k * f0 * t
                                + rng.uniform(0, 6.28))
        k += 1
    x *= (1.0 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t)
          ).astype(np.float32)
    return (0.5 * x / max(1e-6, np.abs(x).max())).astype(np.float32)


class _Corpus:
    def __init__(self, make, n, seed, key, pairing, sr):
        rng = np.random.default_rng(seed)
        self.items = [make(rng, CHUNK, sr)[None] for _ in range(n)]
        self.key = key
        self.pairing = pairing

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return {self.key: self.items[i]}


def _train(model_name, module, dataset, *, epochs, lr, sr, acfg,
           **cfg_kw):
    params, state = module.init(jax.random.PRNGKey(0))
    loader = DataLoader(dataset, batch_size=4, num_workers=1, seed=0)
    cfg = TrainConfig(model=model_name, learning_rate=lr,
                      num_epochs=epochs, **cfg_kw)
    tr = Trainer(model_name, params, state, loader, None, config=cfg,
                 artifact_config=acfg, sample_rate=sr)
    losses = [tr.train_epoch(jax.random.PRNGKey(1000 + e))
              for e in range(epochs)]
    stage = jax.device_get((tr.state["params"], tr.state["model_state"]))
    return losses, stage


def _held_out(make, seconds, sr):
    rng = np.random.default_rng(999)
    d = tempfile.mkdtemp(prefix="qgate_")
    path = os.path.join(d, "held.wav")
    clip = make(rng, int(seconds * sr), sr)
    if clip.ndim == 1:  # mono makers return [T]; the stereo maker [2, T]
        clip = clip[None]
    save_audio(path, clip, sr)
    return path


# harsher-than-default 78rpm artifacts: a lower degraded floor makes the
# "restored beats degraded" bar reachable in a 200-step CPU fit while still
# exercising every artifact class (impulses, surface noise, crackle,
# rumble, rolloff — data/artifacts.py vs reference audio_processing.py).
# The heavy rumble is deliberate: low-frequency error dominates the
# degraded waveform and a learned highpass removes it early, giving the
# waveform-improvement assertion a stable margin at this budget
# (calibrated IN the suite's 8-virtual-device env, where the no-rumble
# variant's SI-SDR margin was environment-fragile).
_GATE_ARTIFACTS = ArtifactConfig(
    impulse_rate=20.0, impulse_amplitude=(0.3, 0.7),
    surface_noise_level=(0.05, 0.08), crackle_level=(0.03, 0.05),
    rumble_level=(0.15, 0.25))


@pytest.mark.slow
def test_denoiser_training_restores_heldout_quality():
    losses, stage = _train(
        "denoiser", denoiser,
        _Corpus(_tone_clip, 32, 100, "clean", "degrade", SR),
        epochs=30, lr=2e-3, sr=SR, acfg=_GATE_ARTIFACTS,
        # the fidelity preset's weights (config/denoiser_fidelity.yaml)
        time_weight=10.0, spectral_weight=0.5, si_sdr_weight=0.05)
    assert losses[-1] < 0.6 * losses[0], (
        f"training barely moved the loss: {losses[0]:.2f}->{losses[-1]:.2f}")

    pipe = RestorationPipeline(
        denoiser=stage,
        config=PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05))
    m = evaluate_denoiser(pipe, [_held_out(_tone_clip, 2.0, SR)],
                          sample_rate=SR, seconds=2.0, seed=7,
                          artifact_cfg=_GATE_ARTIFACTS)
    # calibrated margins (suite env, 3 seeds): SI-SDR improvement
    # +0.78..+1.87 dB, spec -9..-24%, LSD -9..-19 dB
    assert m["sisdr_restored"] > m["sisdr_degraded"] + 0.3, m
    assert m["spec_restored"] < 0.95 * m["spec_degraded"], m
    assert m["lsd_restored"] < m["lsd_degraded"] - 5.0, m


def _wide_stereo_clip(rng, n, sr):
    """Two independent 2-tone stacks, one panned hard-ish left and one
    hard-ish right (constant-power), plus independent low-level noise per
    channel — targets land at genuinely wide statistics (corpus mean
    corr ~0.33, width ~0.34; a single-pan corpus measured corr 0.985 /
    width 0.048, a degenerate gate)."""
    t = np.arange(n) / sr

    def stack():
        x = np.zeros(n, np.float32)
        for _ in range(2):
            f = rng.uniform(120, sr * 0.4)
            x += rng.uniform(0.15, 0.3) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 6.28))
        return x.astype(np.float32)

    s1, s2 = stack(), stack()
    th1 = rng.uniform(0, np.pi / 8)
    th2 = rng.uniform(3 * np.pi / 8, np.pi / 2)
    left = s1 * np.cos(th1) + s2 * np.cos(th2) + 0.02 * rng.normal(size=n)
    right = s1 * np.sin(th1) + s2 * np.sin(th2) + 0.02 * rng.normal(size=n)
    out = np.stack([left, right]).astype(np.float32)
    out *= 0.5 / max(1e-6, np.abs(out).max())
    return out.astype(np.float32)


class _StereoCorpus:
    pairing = "mono_target_stereo"

    def __init__(self, n, seed):
        rng = np.random.default_rng(seed)
        self.items = [_wide_stereo_clip(rng, CHUNK, SR) for _ in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return {"stereo": self.items[i]}


@pytest.mark.slow
def test_stereo_training_matches_target_statistics():
    """Third-model gate (VERDICT r04 item 3): the StereoSeparator is the
    headline quality feature (mid-exact upmix, +3.6 dB chain SNR —
    docs/RESULTS.md) yet a stereo-loss-weight regression would have passed
    all 401 round-4 tests. Short fixed-seed stats-match training
    (config/stereo_width.yaml semantics: stats_match_weight=1.0,
    losses/stereo.py::stereo_stats_match_loss) must land the upmix's
    width/correlation far closer to the target statistics than the
    mono-duplicate baseline (corr 1.0, width 0.0), and the mid-exact
    serving mode must keep the input mid bit-near-exactly.

    Calibrated in the suite's env (2026-08-20): target corr 0.331 /
    width 0.342 -> baseline distance 1.011; model distance 0.445 @10
    epochs, 0.164 @20, 0.202 @30 (gate: <0.6x baseline at 20 epochs).
    Protects train/trainer.py's stereo loss wiring (reference
    src/training/stereo_losses.py:7-87, trainer.py:227-254)."""
    from ml_audio_restoration_tpu.audio import load_audio, normalize_audio
    from ml_audio_restoration_tpu.evaluate import evaluate_stereo
    from ml_audio_restoration_tpu.models import stereo_separator

    losses, stage = _train(
        "stereo_separator", stereo_separator, _StereoCorpus(16, 100),
        epochs=20, lr=5e-4, sr=SR, acfg=ArtifactConfig(),
        stats_match_weight=1.0)
    assert losses[-1] < 0.8 * losses[0], (
        f"training barely moved the loss: {losses[0]:.2f}->{losses[-1]:.2f}")

    held = _held_out(_wide_stereo_clip, 2.0, SR)
    pipe = RestorationPipeline(
        stereo=stage,
        config=PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05,
                              enable_super_resolution=False))
    m = evaluate_stereo(pipe, [held], sample_rate=SR, seconds=2.0)
    dist = (abs(m["correlation_upmix"] - m["correlation_target"])
            + abs(m["width_upmix"] - m["width_target"]))
    baseline = abs(1.0 - m["correlation_target"]) + m["width_target"]
    assert dist < 0.6 * baseline, (
        f"upmix statistics no closer to target than a mono duplicate: "
        f"model distance {dist:.3f} vs baseline {baseline:.3f} ({m})")

    # mid-exactness: the stereo_mid_exact serving mode rebuilds L/R around
    # the true input mid — the upmix cannot degrade mono fidelity
    # (calibrated dev 1.5e-8; gate well above float noise, far below
    # audible)
    pipe_me = RestorationPipeline(
        stereo=stage,
        config=PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05,
                              enable_super_resolution=False,
                              stereo_mid_exact=True))
    stereo, _ = load_audio(held, SR, mono=False)
    mono = np.asarray(normalize_audio(stereo)).mean(
        axis=0, keepdims=True)[:, :2 * SR]
    up, _ = pipe_me.restore(mono, SR)
    up = np.asarray(up)[:, :mono.shape[1]]
    mid = (up[0] + up[1]) / 2
    assert np.abs(mid - mono[0]).max() < 1e-5


@pytest.mark.slow
def test_super_resolution_beats_linear_interpolation():
    losses, stage = _train(
        "super_resolution", super_resolution,
        _Corpus(_harm_clip, 32, 100, "high", "downsample", HR),
        epochs=90, lr=1.5e-3, sr=HR, acfg=ArtifactConfig())
    assert losses[-1] < 0.9 * losses[0], (
        f"training barely moved the loss: {losses[0]:.2f}->{losses[-1]:.2f}")

    pipe = RestorationPipeline(
        super_resolution=stage,
        config=PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05))
    m = evaluate_super_resolution(pipe, [_held_out(_harm_clip, 2.0, HR)],
                                  high_rate=HR, seconds=2.0)
    # calibrated margin: model beat linear by 1.2-4.2 dB LSD over 5 seeds
    assert m["lsd_model"] < m["lsd_linear"] - 0.5, m

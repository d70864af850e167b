"""One real config system (dataclasses + YAML), consumed by both library and CLI.

The reference has config *drift by design*: hard-coded dicts in each training
script (/root/reference/src/training/train_denoiser.py:17-30) plus YAML files
in config/ that are never parsed and disagree with the code defaults
(e.g. features [64,128,256,512] vs code [32,64,128]) — its remote script even
edits the dict with sed (scripts/train_remote.sh:31-33). Here the dataclasses
are the single source of truth; YAML overlays them field-by-field.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple


@dataclass
class DenoiserConfig:
    in_channels: int = 1
    out_channels: int = 1
    features: Tuple[int, ...] = (32, 64, 128)


@dataclass
class SuperResolutionConfig:
    upscale_factor: int = 2
    channels: int = 1
    base_channels: int = 32
    num_residual_blocks: int = 4


@dataclass
class StereoSeparatorConfig:
    base_channels: int = 32
    lstm_hidden: int = 64
    num_lstm_layers: int = 1


@dataclass
class ArtifactConfig:
    """simulate_vinyl_artifacts knobs (audio_processing.py:122-147)."""
    impulse_rate: float = 10.0
    impulse_amplitude: Tuple[float, float] = (0.1, 0.5)
    surface_noise_level: Tuple[float, float] = (0.015, 0.03)
    crackle_level: Tuple[float, float] = (0.01, 0.02)
    add_rumble: bool = True
    add_rolloff: bool = True
    rumble_level: Tuple[float, float] = (0.005, 0.015)
    rolloff_freq: Tuple[float, float] = (6000.0, 8000.0)


@dataclass
class DataConfig:
    data_dir: str = "data/raw"
    degraded_dir: Optional[str] = None
    sample_rate: int = 22050
    chunk_duration: float = 2.0
    val_split: float = 0.1
    synthetic_ratio: float = 0.7
    # opt-in fix for the reproduced upstream quirk (PARITY.md "Known
    # upstream quirks"): files whose native rate differs from sample_rate
    # yield native-rate training chunks (with a warning). True = seek-read
    # a rate-scaled window and resample it to sample_rate.
    resample_chunks: bool = False
    artifacts: ArtifactConfig = field(default_factory=ArtifactConfig)


@dataclass
class TrainConfig:
    model: str = "denoiser"  # denoiser | super_resolution | stereo_separator
    batch_size: int = 4
    num_epochs: int = 100
    learning_rate: float = 1e-4
    save_every: int = 10
    seed: int = 0
    checkpoint_dir: str = "models/checkpoints"
    log_dir: str = "runs"
    test_audio_dir: Optional[str] = None
    test_output_dir: Optional[str] = None
    # plateau scheduler (reference: patience 5, factor 0.5, trainer.py:85-87)
    plateau_patience: int = 5
    plateau_factor: float = 0.5
    # loss weights (reference trainer.py:70-79). The last three exist in the
    # reference but are never wired into its loop (trainer.py:121-225);
    # default 0.0 preserves parity, set >0 to enable them.
    time_weight: float = 1.0
    spectral_weight: float = 0.5
    impulse_weight: float = 0.3
    clustering_weight: float = 0.1
    consistency_weight: float = 0.05
    balance_weight: float = 0.0
    decorrelation_weight: float = 0.0
    lf_centering_weight: float = 0.0
    # our extension (no reference counterpart): match the TARGET's stereo
    # correlation/width statistics instead of forcing |corr| -> 0; see
    # losses/stereo.py::stereo_stats_match_loss. 0 = parity.
    stats_match_weight: float = 0.0
    # waveform-fidelity extension (0 = reference parity): -SI-SDR (dB) term
    si_sdr_weight: float = 0.0
    # contrastive loss over mixed-dataset pairs (reference stubs this with a
    # TODO, semi_supervised.py:200-203; 0 = parity with the stub)
    contrastive_weight: float = 0.0
    # global-norm gradient clipping before Adam (no reference counterpart;
    # 0 = off = parity). Standard guard for loss spikes from extreme
    # synthesized artifacts (pop amplitudes are drawn per item).
    max_grad_norm: float = 0.0
    # exponential moving average of the weights (no reference counterpart;
    # 0 = off = parity). When >0 (e.g. 0.999) the trainer maintains EMA
    # params inside the jitted step and uses them for validation, audio
    # rendering, and test outputs — the standard eval-the-averaged-model
    # practice. Raw params keep training/checkpointing as before.
    ema_decay: float = 0.0
    # numerics: f32 params; bf16 compute is the TPU analogue of AMP
    compute_dtype: str = "float32"
    # LSTM recurrence impl for the stereo family's train step: None routes
    # by backend — the fused Pallas forward+backward VJP on TPU (measured
    # round 4: 285 -> 124 ms/step at batch 16 x 2 s, 2.3x; gradients
    # verified exact vs the scan VJP), lax.scan elsewhere. 'scan' forces
    # the reference formulation; ignored by the conv-only families.
    lstm_impl: Optional[str] = None
    # packed (space-to-depth) convs in the DENOISER train step: None routes
    # by backend — True on TPU (the C=32/64 stages are lane-padded 4x/2x in
    # HBM; the packed train forward measured the isolated stages 2.2x and
    # the full step 59.2 -> 31.8 ms = 540 -> 1006 audio-s/s —
    # docs/PERFORMANCE.md round-5 "Train-step rooflines"), False elsewhere/
    # for other families. Outputs, BN stats and gradients equal the plain
    # path up to float reassociation
    # (models/denoiser.py::apply_train_packed).
    packed_convs: Optional[bool] = None
    # data-parallel mesh axis size (1 = single chip)
    data_parallel: int = 1
    sync_batchnorm: bool = False


@dataclass
class PipelineConfig:
    sample_rate: int = 22050
    chunk_seconds: float = 2.0
    overlap_seconds: float = 0.05
    enable_super_resolution: bool = True
    whole_file: bool = False  # reference inference.py runs unchunked
    compute_dtype: str = "float32"
    # finer internal chunking for the LSTM stereo stage (None = outer chunks;
    # e.g. 0.5 trades LSTM context for ~4x fewer sequential steps)
    stereo_chunk_seconds: Optional[float] = None
    # packed (space-to-depth) serving convs: run the C<=32 full-rate stages
    # r=4-packed so activations fill the TPU's 128-lane tiles instead of
    # carrying a 4x padding expansion (ops/packed.py; measured 1.6x on the
    # C=32 conv stacks). Numerically equal to the plain path up to float
    # reassociation (~1e-6); stages with non-default shapes fall back to the
    # plain path automatically. False = exact legacy computation order.
    packed_convs: bool = True
    # int8 serving quantization (opt-in): conv stacks run s8 x s8 -> s32 on
    # the MXU with int8 activations between layers — half the HBM traffic
    # of bf16 on the bandwidth-bound non-LSTM portion (ops/quant.py;
    # measured ~1.6x on the packed conv stacks, scripts/int8_conv_probe.py).
    # Needs per-layer activation scales: the pipeline auto-calibrates on
    # the first recording it serves (one extra f32 pass) unless
    # calibrate_int8()/load_int8_scales() ran first. Quantization error is
    # ~1e-2 waveform-scale — far outside the 1e-3 parity bar, so this is
    # a preset knob (config/fast_serve_int8.yaml), never the default;
    # quality on trained checkpoints is measured in docs/RESULTS.md.
    quantize_int8: bool = False
    # which conv stacks quantize under quantize_int8: "packed" (default)
    # quantizes only the r>1 packed stages — measured on v5e, XLA lowers
    # the plain-layout C>=128 dilated/pointwise convs (stereo encoder
    # tail, denoiser middle) SLOWER in int8 than bf16, so those stay in
    # compute_dtype; "full" quantizes everything (ops/quant.py).
    # Calibration records every point, so saved scales fit either scope.
    int8_scope: str = "packed"
    # mid-exact upmix: keep the stereo model's predicted SIDE signal but
    # rebuild L/R around the true input mid (out = mid +/- side), so the
    # upmix cannot degrade mono fidelity — measured +3.6 dB mid SNR on the
    # full chain at equal stereo statistics (docs/RESULTS.md). False =
    # reference parity (raw L/R decoder output).
    stereo_mid_exact: bool = False
    # source-rate stereo: run the stereo stage on the DENOISED source-rate
    # signal (pre super-resolution) and upsample only its predicted side,
    # rebuilding L/R around the exact SR mid (mid-exact semantics are
    # implied). Halves the LSTM's sequential step count — the pipeline's
    # latency floor (docs/PERFORMANCE.md) — and feeds the stereo model the
    # 22.05 kHz rate the reference actually TRAINS it at (its inference
    # feeds a 22.05-trained model 44.1 kHz audio, inference.py:78-94 —
    # see PARITY.md "Known upstream quirks"). Off = reference parity.
    stereo_source_rate: bool = False
    # bound on chunks per compiled program: longer recordings are processed
    # in slabs of this many chunks (bounded HBM, one compile reused) and the
    # slab outputs crossfaded — bit-exact vs single-shot
    max_chunks_per_program: int = 64
    # LSTM recurrence implementation for the stereo stage: None routes by
    # backend — the fused Pallas kernel on TPU (measured round 4: +27%
    # f32 full windows BIT-IDENTICAL to the scan, +13–17% on the bf16
    # presets at ~2e-4 dev — docs/PERFORMANCE.md "Pallas LSTM in batch
    # serving"), lax.scan elsewhere. 'scan'/'pallas' force one.
    lstm_impl: Optional[str] = None


@dataclass
class Config:
    denoiser: DenoiserConfig = field(default_factory=DenoiserConfig)
    super_resolution: SuperResolutionConfig = field(
        default_factory=SuperResolutionConfig)
    stereo_separator: StereoSeparatorConfig = field(
        default_factory=StereoSeparatorConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)


def _overlay(obj, updates: dict):
    for key, value in updates.items():
        if not hasattr(obj, key):
            raise KeyError(
                f"unknown config field {key!r} for {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _overlay(current, value)
        else:
            if isinstance(current, tuple) and isinstance(value, list):
                value = tuple(value)
            setattr(obj, key, value)
    return obj


def load_config(path=None, overrides: dict | None = None) -> Config:
    """Defaults <- YAML file (optional) <- overrides dict (optional)."""
    cfg = Config()
    if path is not None:
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        _overlay(cfg, data)
    if overrides:
        _overlay(cfg, overrides)
    return cfg


def save_config(cfg: Config, path):
    import yaml

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)

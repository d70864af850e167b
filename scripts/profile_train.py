#!/usr/bin/env python
"""Device-time breakdown of the jitted train step, per model family.

Runs a few steady-state training steps for each family under a
jax.profiler trace and aggregates device-side op durations from the xplane
dump (grouped into recurrence / convolution / fusion / data-movement
buckets). This is the measurement behind the training section of
docs/PERFORMANCE.md — wall-clock micro-timing is meaningless on the shared
dev relay (25 ms dispatch jitter), device time is not.

    python scripts/profile_train.py [denoiser|super_resolution|stereo_separator ...]

Prints one JSON object per family.
"""
from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _xplane_device_times(logdir: str) -> dict:
    """Shared implementation lives in utils/profiling.py (bench.py uses it
    too for the congestion-proof device-basis extras)."""
    from ml_audio_restoration_tpu.utils.profiling import xplane_device_times

    return xplane_device_times(logdir)


def profile_family(model_name: str, batch: int = 16, chunk_s: float = 2.0,
                   warmup: int = 2, steps: int = 4, **cfg_kw) -> dict:
    """`cfg_kw` forwards to TrainConfig — e.g. packed_convs=False /
    compute_dtype='bfloat16' for the packed/AMP train A/Bs."""
    import jax

    from bench import _TRAIN_BENCH  # single source of pairing/shape truth
    from ml_audio_restoration_tpu.config import TrainConfig, ArtifactConfig
    from ml_audio_restoration_tpu.data.loader import DataLoader
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    from ml_audio_restoration_tpu.train.trainer import Trainer
    from ml_audio_restoration_tpu.utils.profiling import trace

    module = {"denoiser": denoiser, "super_resolution": super_resolution,
              "stereo_separator": stereo_separator}[model_name]
    pairing, key_name, ch, sr = _TRAIN_BENCH[model_name]
    chunk = int(chunk_s * sr)

    class Toy:
        def __len__(self):
            return batch * (warmup + steps)

        def __getitem__(self, i):
            t = np.arange(chunk) / sr
            x = (0.3 * np.sin(2 * np.pi * (200 + 7 * i) * t)).astype(
                np.float32)
            return {key_name: np.stack([x * (1.0 if c == 0 else 0.6)
                                        for c in range(ch)])}

    Toy.pairing = pairing
    params, state = module.init(jax.random.PRNGKey(0))
    trainer = Trainer(
        model_name, params, state,
        DataLoader(Toy(), batch, num_workers=1, shuffle=False),
        config=TrainConfig(model=model_name, **cfg_kw),
        artifact_config=ArtifactConfig(), sample_rate=sr)

    batches = list(trainer.train_loader)
    key = jax.random.PRNGKey(1)
    for b in batches[:warmup]:
        trainer.state, m = trainer._train_step(trainer.state, b, key)
    float(m["loss"])  # sync compile

    logdir = tempfile.mkdtemp(prefix=f"prof_{model_name}_")
    with trace(logdir):
        for i, b in enumerate(batches[warmup:warmup + steps]):
            trainer.state, m = trainer._train_step(
                trainer.state, b, jax.random.fold_in(key, i))
        float(m["loss"])  # sync inside the trace

    times = _xplane_device_times(logdir)
    spans = times["module_step_ms"] or [times["total_device_ms"] / steps]
    step_ms = sum(spans) / len(spans)
    out = {
        "model": model_name,
        "batch": batch,
        "steps_traced": steps,
        "device_ms_per_step": round(step_ms, 2),
        "device_audio_sec_per_sec": round(batch * chunk_s / (step_ms / 1e3), 1),
        "breakdown_ms": times,
    }
    return out


def main(argv=None):
    families = (argv or sys.argv[1:]) or [
        "denoiser", "super_resolution", "stereo_separator"]
    for fam in families:
        print(json.dumps(profile_family(fam)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

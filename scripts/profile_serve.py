#!/usr/bin/env python
"""Device-time A/B of the serve path: packed vs plain convs, f32 vs bf16.

Traces full-pipeline restore() calls (ONE compiled program per 120-s
recording at the default config) and reports the XLA-module device span per
call — the congestion-proof measurement (wall-clock on the shared dev relay
is weather; device spans are not). This is the adoption measurement for the
packed C<=32 conv lever (ops/packed.py, docs/PERFORMANCE.md).

    python scripts/profile_serve.py [seconds] [config ...]

configs: plain / packed / plain_bf16 / packed_bf16 (default: all four).
Prints one JSON line per config.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = {
    "plain": {"packed_convs": False},
    "packed": {"packed_convs": True},
    "plain_bf16": {"packed_convs": False, "compute_dtype": "bfloat16"},
    "packed_bf16": {"packed_convs": True, "compute_dtype": "bfloat16"},
    # the config/fast_serve.yaml preset (+ packed, its default)
    "fast_serve": {"packed_convs": True, "compute_dtype": "bfloat16",
                   "stereo_chunk_seconds": 0.25},
    "fast_serve_plain": {"packed_convs": False,
                         "compute_dtype": "bfloat16",
                         "stereo_chunk_seconds": 0.25},
    # int8-quantized conv stacks (ops/quant.py; auto-calibrates on the
    # warmup call) on top of the default / fast_serve configs
    # source-rate stereo (side predicted pre-SR at half the sample rate —
    # halves the LSTM recurrence, PipelineConfig.stereo_source_rate)
    "src_bf16": {"packed_convs": True, "compute_dtype": "bfloat16",
                 "stereo_source_rate": True},
    "fast_serve_src": {"packed_convs": True, "compute_dtype": "bfloat16",
                       "stereo_chunk_seconds": 0.25,
                       "stereo_source_rate": True},
    "fast_serve_src_int8": {"packed_convs": True,
                            "compute_dtype": "bfloat16",
                            "stereo_chunk_seconds": 0.25,
                            "stereo_source_rate": True,
                            "quantize_int8": True},
    "int8": {"packed_convs": True, "quantize_int8": True},
    "fast_serve_int8": {"packed_convs": True, "compute_dtype": "bfloat16",
                        "stereo_chunk_seconds": 0.25,
                        "quantize_int8": True},
    # scope ablation: quantize the plain-layout C>=128 stages too
    # (measured slower than bf16 on v5e — the reason scope defaults
    # to "packed")
    "fast_serve_int8_full": {"packed_convs": True,
                             "compute_dtype": "bfloat16",
                             "stereo_chunk_seconds": 0.25,
                             "quantize_int8": True, "int8_scope": "full"},
    "int8_full": {"packed_convs": True, "quantize_int8": True,
                  "int8_scope": "full"},
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    seconds = float(argv.pop(0)) if argv and argv[0][0].isdigit() else 120.0
    names = argv or list(CONFIGS)

    import jax

    from bench import _make_audio, _sync
    from ml_audio_restoration_tpu.config import PipelineConfig
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    from ml_audio_restoration_tpu.pipeline import RestorationPipeline
    from ml_audio_restoration_tpu.utils.cache import (
        enable_persistent_compile_cache)
    from ml_audio_restoration_tpu.utils.profiling import (
        trace, xplane_device_times)

    enable_persistent_compile_cache()
    sr = 22050
    audio = _make_audio(seconds, sr)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    stages = {"denoiser": denoiser.init(k1),
              "super_resolution": super_resolution.init(k2),
              "stereo": stereo_separator.init(k3)}

    base = PipelineConfig(chunk_seconds=2.0, overlap_seconds=0.05)
    ref_out = None
    for name in names:
        cfg = dataclasses.replace(base, **CONFIGS[name])
        pipe = RestorationPipeline(**stages, config=cfg)
        out, _ = pipe.restore(audio, sr)  # compile + warm
        _sync(out)
        if name == "plain":
            ref_out = np.asarray(out)
        logdir = tempfile.mkdtemp(prefix=f"serve_{name}_")
        with trace(logdir):
            out, _ = pipe.restore(audio, sr)
            _sync(out)
        times = xplane_device_times(logdir)
        spans = times["module_step_ms"]
        dev_ms = max(spans) if spans else times["total_device_ms"]
        rec = {
            "config": name,
            "audio_seconds": seconds,
            "device_ms_per_call": round(dev_ms, 1),
            "device_xrt": round(seconds / (dev_ms / 1e3), 1),
            "breakdown": {k: v for k, v in times.items()
                          if k != "module_step_ms"},
        }
        if ref_out is not None:
            rec["max_dev_vs_plain_f32"] = float(
                np.abs(np.asarray(out) - ref_out).max())
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Scan vs Pallas LSTM recurrence A/B on the SERVE path (round 4).

The round-3 batch A/B ran the production full-window shape
[60 chunks, 88200 steps] where the scan's entry cost amortizes over 88k
steps and the kernel tied (117 vs 106 ms — ops/lstm.py docstring). But the
fast_serve_src profile (scripts/profile_src_fusions.py) shows the
sub-chunked source-rate regime is different: [640 chunks, 5512 steps],
where the scan pays 689 per-block iterations of XLA fusion dispatch
(dynamic-slice on the 1.8 GB gates buffer + 7 gate fusions + state
update ~ 12.5 ms, hidden in the "elementwise" bucket) on top of the
while-loop span (~15.7 ms). That is exactly the per-entry/per-step
overhead the kernel eliminated in streaming (+26%). This script measures
whether it transfers to batch serving at sub-chunked windows.

    python scripts/profile_serve_lstm_ablate.py [seconds] [config ...]

Each config runs twice (scan, then pallas via ops.lstm.set_default_impl)
and prints one JSON line per run with the device span + max |dev| of the
pallas output vs the scan output.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    seconds = float(argv.pop(0)) if argv and argv[0][0].isdigit() else 120.0
    names = argv or ["fast_serve_src", "fast_serve"]

    import jax

    from bench import _make_audio, _sync
    from profile_serve import CONFIGS
    from ml_audio_restoration_tpu.config import PipelineConfig
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    import importlib

    # ops/__init__ re-exports the lstm FUNCTION under the submodule's name,
    # shadowing it even for `import pkg.ops.lstm as m` — go through
    # importlib like profile_streaming_ablate.py does
    lstm_mod = importlib.import_module("ml_audio_restoration_tpu.ops.lstm")
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

    for name in names:
        cfg = dataclasses.replace(
            PipelineConfig(chunk_seconds=2.0, overlap_seconds=0.05),
            **CONFIGS[name])
        ref_out = None
        for impl in ("scan", "pallas"):
            prev = lstm_mod.set_default_impl(impl)
            try:
                pipe = RestorationPipeline(**stages, config=cfg)
                out, out_sr = pipe.restore(audio, sr)
                _sync(out)
                if impl == "scan":
                    ref_out = np.asarray(out)
                logdir = tempfile.mkdtemp(prefix=f"lstmab_{name}_{impl}_")
                with trace(logdir):
                    out, _ = pipe.restore(audio, sr)
                    _sync(out)
                times = xplane_device_times(logdir)
                row = {"config": name, "impl": impl,
                       "device_ms": round(sum(times["module_step_ms"])
                                          or times["total_device_ms"], 2),
                       "buckets": {k: v for k, v in times.items()
                                   if isinstance(v, float)}}
                if impl == "pallas" and ref_out is not None:
                    row["max_dev_vs_scan"] = float(
                        np.max(np.abs(np.asarray(out) - ref_out)))
                print(json.dumps(row), flush=True)
            finally:
                lstm_mod.set_default_impl(prev)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

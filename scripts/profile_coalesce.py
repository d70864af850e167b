#!/usr/bin/env python
"""Device-time A/B for coalesced short-request serving
(RestorationPipeline.restore_many — the HTTP daemon's dynamic batching).

Workload: K short recordings through the full 3-stage packed chain.
  individual — K pipeline.restore calls. Each frames to a handful of
               chunks and buckets up to the granularity (a 10 s file at
               2 s chunks = 5 real chunks padded to 8 -> 37% wasted rows),
               plus one program dispatch per request.
  coalesced  — ONE restore_many over the same K recordings: the combined
               chunk batch runs as a single near-full stage program, then
               K tiny per-recording overlap-add programs.

Device basis: sum of XLA-module spans inside the trace window (programs on
one chip serialize, so the sum is the busy time a request stream pays).

usage: profile_coalesce.py [K] [seconds_per_request]
"""
from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    args = argv if argv is not None else sys.argv[1:]
    k = int(args[0]) if args else 8
    seconds = float(args[1]) if len(args) > 1 else 10.0

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
    base = _make_audio(seconds, sr)
    rng = np.random.default_rng(7)
    audios = [(base + 0.01 * rng.normal(size=base.shape)
               ).astype(np.float32) for _ in range(k)]
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    stages = {"denoiser": denoiser.init(k1),
              "super_resolution": super_resolution.init(k2),
              "stereo": stereo_separator.init(k3)}
    cfg = PipelineConfig(chunk_seconds=2.0, overlap_seconds=0.05,
                         packed_convs=True)
    pipe = RestorationPipeline(**stages, config=cfg)

    def run_individual():
        outs = [pipe.restore(a, sr)[0] for a in audios]
        return sum(_sync(o) for o in outs)

    def run_coalesced():
        outs = pipe.restore_many(audios, sr)
        return sum(_sync(o) for o, _ in outs)

    results = {}
    for name, run in (("individual", run_individual),
                      ("coalesced", run_coalesced)):
        run()  # compile + warm
        run()
        logdir = tempfile.mkdtemp(prefix=f"coalesce_{name}_")
        with trace(logdir):
            run()
        times = xplane_device_times(logdir)
        dev_ms = sum(times["module_step_ms"]) or times["total_device_ms"]
        results[name] = dev_ms
        print(json.dumps({
            "config": name,
            "requests": k,
            "seconds_each": seconds,
            "device_ms_total": round(dev_ms, 1),
            "device_ms_per_request": round(dev_ms / k, 2),
            "device_xrt": round(k * seconds / (dev_ms / 1e3), 1),
            "programs": len(times["module_step_ms"]),
        }), flush=True)
    if results.get("individual") and results.get("coalesced"):
        print(json.dumps({
            "coalesce_speedup": round(
                results["individual"] / results["coalesced"], 3)}),
            flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

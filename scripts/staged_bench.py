#!/usr/bin/env python
"""Staged (pipeline-parallel) vs data-parallel serving measurement.

SURVEY.md §2.7 row 3 / VERDICT round-1 item 9: stage the three models on
different devices and stream chunk slabs through, vs sharding the chunk
batch over a 'data' mesh. This script measures both on the same device set
so the comparison is apples-to-apples; on this dev harness that is the
8-virtual-CPU-device mesh (one real TPU chip cannot host a 3-stage
pipeline), so treat the numbers as *relative* — the regime boundary, not
absolute xRT.

    python scripts/staged_bench.py [--seconds-list 2 10 60] [--iters 3]

Prints one JSON row per (workload, mode). The conclusion lands in
docs/PERFORMANCE.md "Pipeline-parallel serving".
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from bench import _make_audio  # noqa: E402
from ml_audio_restoration_tpu.config import PipelineConfig  # noqa: E402
from ml_audio_restoration_tpu.models import (  # noqa: E402
    denoiser, super_resolution, stereo_separator)
from ml_audio_restoration_tpu.pipeline import (  # noqa: E402
    RestorationPipeline, StagedRestorationPipeline)


def _time(fn, iters):
    fn()  # warmup/compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out, _ = fn()
        float(np.asarray(out).sum())  # force readback
        times.append(time.perf_counter() - t0)
    return min(times)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seconds-list", type=float, nargs="+",
                   default=[2.0, 10.0, 60.0])
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args(argv)

    sr = 22050
    key = jax.random.PRNGKey(0)
    kd, ks, kt = jax.random.split(key, 3)
    stages = dict(denoiser=denoiser.init(kd),
                  super_resolution=super_resolution.init(ks),
                  stereo=stereo_separator.init(kt))
    devs = jax.devices()

    modes = {
        "single_device": dict(pipe=RestorationPipeline(
            **stages, config=PipelineConfig())),
        "staged_3dev": dict(pipe=StagedRestorationPipeline(
            **stages, config=PipelineConfig(), devices=devs[:3])),
        "data_parallel_3dev": dict(pipe=RestorationPipeline(
            **stages, config=PipelineConfig(),
            mesh=Mesh(np.array(devs[:3]), ("data",)))),
        "data_parallel_8dev": dict(pipe=RestorationPipeline(
            **stages, config=PipelineConfig(),
            mesh=Mesh(np.array(devs), ("data",)))),
    }

    base_out = {}
    for seconds in args.seconds_list:
        audio = _make_audio(seconds, sr)
        for name, m in modes.items():
            pipe = m["pipe"]
            wall = _time(lambda: pipe.restore(audio, sr), args.iters)
            out, _ = pipe.restore(audio, sr)
            out = np.asarray(out)
            if seconds not in base_out:
                base_out[seconds] = out
            dev = float(np.abs(out - base_out[seconds]).max())
            print(json.dumps({
                "audio_seconds": seconds,
                "mode": name,
                "wall_s": round(wall, 4),
                "xrt_relative": round(seconds / wall, 2),
                "max_dev_vs_single": round(dev, 7),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

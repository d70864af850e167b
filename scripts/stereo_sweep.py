#!/usr/bin/env python
"""Speed/quality sweep of the stereo stage's LSTM window knob.

The stereo stage is the full-pipeline perf floor (BENCH_r01: 221x vs
514x/465x for the other stages) because its LSTM runs sequentially over
each 2-s chunk. `stereo_chunk_seconds` shortens the internal LSTM windows
(proportionally fewer sequential steps, more batch) at the cost of LSTM
context — the reference has the same trade hard-coded at 2 s
(/root/reference/README.md:175, stereo_separator.py:107 — its LSTM state
resets every chunk too).

This sweep measures, on a TRAINED checkpoint, what each setting costs:
upmix correlation/width vs the stereo targets (evaluate.py metrics), output
deviation vs the full-window path, and stereo-only xRT on the bench signal.

    python scripts/stereo_sweep.py --stereo models/checkpoints/stereo/best_model.msgpack \
        --eval-dir data/eval_stereo22 [--seconds 120] [--dtype bfloat16]

Prints one JSON row per setting; the table lands in docs/PERFORMANCE.md.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _make_audio, _time_pipeline  # noqa: E402
from ml_audio_restoration_tpu.audio import (  # noqa: E402
    find_audio_files, load_audio, normalize_audio)
from ml_audio_restoration_tpu.config import PipelineConfig  # noqa: E402
from ml_audio_restoration_tpu.evaluate import evaluate_stereo  # noqa: E402
from ml_audio_restoration_tpu.pipeline import RestorationPipeline  # noqa: E402

SWEEP = (None, 1.0, 0.5, 0.25)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stereo", required=True)
    p.add_argument("--eval-dir", required=True)
    p.add_argument("--seconds", type=float, default=120.0)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--eval-seconds", type=float, default=8.0)
    args = p.parse_args(argv)

    sr = 22050
    bench_audio = _make_audio(args.seconds, sr)
    files = find_audio_files(args.eval_dir)

    # reference output for deviation measurement: full-window path on the
    # first eval file
    ref_stereo, _ = load_audio(files[0], sr, mono=False)
    ref_mono = np.asarray(normalize_audio(ref_stereo))[:2].mean(
        axis=0, keepdims=True)[:, :int(args.eval_seconds * sr)]
    base_out = None

    for scs in SWEEP:
        cfg = PipelineConfig(stereo_chunk_seconds=scs,
                             compute_dtype=args.dtype)
        pipe = RestorationPipeline.from_checkpoints(stereo_path=args.stereo,
                                                    config=cfg)
        quality = evaluate_stereo(pipe, files, sample_rate=sr,
                                  seconds=args.eval_seconds)
        wall = min(_time_pipeline(pipe, bench_audio, sr, warmup=1, iters=3))

        out, _ = pipe.restore(ref_mono, sr)
        out = np.asarray(out)
        if base_out is None:
            base_out = out
            dev, corr = 0.0, 1.0
        else:
            n = min(out.shape[1], base_out.shape[1])
            a, b = out[:, :n], base_out[:, :n]
            dev = float(np.abs(a - b).max())
            corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])

        print(json.dumps({
            "stereo_chunk_seconds": scs,
            "dtype": args.dtype,
            "stereo_only_xrt": round(args.seconds / wall, 1),
            "vs_full_window": {"max_dev": round(dev, 5),
                               "corr": round(corr, 5)},
            **quality,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

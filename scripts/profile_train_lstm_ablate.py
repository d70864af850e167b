#!/usr/bin/env python
"""Scan vs fused-Pallas-VJP LSTM on the STEREO TRAIN step (round 4).

The stereo train step is recurrence-bound (fwd+bwd LSTM = 167 of
285 ms/step f32 at batch 16 x 2 s — docs/PERFORMANCE.md "Training
step"). The serve-side adoption removed the scan's per-step overhead in
inference; this A/B measures the training analogue: the
`lstm_recurrence_train` custom VJP (ops/lstm.py) pairs a forward kernel
that saves gate activations + cell sequence with a fused reverse-time
backward kernel (VMEM-resident (dh, dc) carries and dW_hh accumulator),
replacing BOTH the XLA scan forward and its unrolled backward.

    python scripts/profile_train_lstm_ablate.py [family ...]

Runs each family's profile_train measurement once per impl and prints
one JSON line per (family, impl). Loss equality across impls is checked
to ~1e-4 (the kernel computes the recurrence in f32 exactly like the
f32 scan; tiny reassociation differences only).
"""
from __future__ import annotations

import importlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    families = (argv or sys.argv[1:]) or ["stereo_separator"]

    lstm_mod = importlib.import_module("ml_audio_restoration_tpu.ops.lstm")
    from profile_train import profile_family

    for fam in families:
        for impl in ("scan", "pallas_train"):
            prev = lstm_mod.set_default_impl(impl)
            try:
                out = profile_family(fam)
                out["lstm_impl"] = impl
                print(json.dumps(out), flush=True)
            finally:
                lstm_mod.set_default_impl(prev)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Full-budget certification of the pallas_train default (VERDICT r04 #2).

Round 4 adopted the fused Pallas forward+backward LSTM VJP as the stereo
family's training default on exact-gradient interpret tests plus a 6-step
loss trajectory (drift 0.012 by step 6, Adam amplifying ~1e-5
reassociation). Nothing certified that a FULL-budget run reaches the same
final quality as the scan. This script runs the stereo stats-match preset
(config/stereo_width.yaml semantics) twice at EQUAL EPOCHS — identical
data, seeds, batch, lr; only `train.lstm_impl` differs — and evaluates
both checkpoints on the held-out stereo corpus. Certification = final
stats distances agree within run-to-run noise (the 0.026 gap that
separated the round-4 budget-A/B arms is the scale bar); if they do not,
the default flips back to scan.

    python scripts/pallas_train_cert.py [epochs] [--train-dir D]
        [--eval-dir D]

Defaults: 120 epochs (the preset's budget), data/stereo22,
data/eval_stereo22. Prints one JSON line per arm + a verdict line.
Equal EPOCHS (not equal wall) is the right control here: the question is
numerics, not throughput — the kernel's 2.3x step speedup is already
measured (docs/evidence/r04/trainab.log).
"""
from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = ("scan", "pallas_train")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    epochs = int(argv.pop(0)) if argv and argv[0].isdigit() else 120
    train_dir, eval_dir = "data/stereo22", "data/eval_stereo22"
    while argv:
        a = argv.pop(0)
        if a == "--train-dir":
            train_dir = argv.pop(0)
        elif a == "--eval-dir":
            eval_dir = argv.pop(0)
        else:
            raise SystemExit(f"unknown arg {a}")

    import yaml

    root = Path(tempfile.mkdtemp(prefix="pallas_cert_"))
    results = []
    for arm in ARMS:
        ckpt_dir = root / arm / "ckpt"
        log_dir = root / arm / "runs"
        overlay = {
            "train": {"model": "stereo_separator",
                      "num_epochs": epochs,
                      "learning_rate": 1.0e-4,
                      "batch_size": 16,
                      "stats_match_weight": 1.0,
                      "lstm_impl": arm,
                      "save_every": 1000000,  # only the final checkpoint
                      "checkpoint_dir": str(ckpt_dir),
                      "log_dir": str(log_dir)},
            "data": {"data_dir": train_dir, "sample_rate": 22050,
                     "chunk_duration": 2.0, "val_split": 0.1},
        }
        cfg_path = root / f"{arm}.yaml"
        cfg_path.write_text(yaml.safe_dump(overlay))
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "-m", "ml_audio_restoration_tpu.cli", "train",
             "stereo_separator", "--config", str(cfg_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            timeout=7200)
        wall = time.monotonic() - t0
        if proc.returncode != 0:
            raise SystemExit(f"{arm}: trainer failed:\n{proc.stdout[-3000:]}")

        jsonl = log_dir / "stereo_separator" / "stereo_separator.jsonl"
        epoch_losses = []
        for line in jsonl.read_text().splitlines():
            rec = json.loads(line)
            if rec.get("tag") == "Loss/train_epoch":
                epoch_losses.append(round(rec["value"], 5))

        ckpts = sorted(ckpt_dir.rglob("*.msgpack"),
                       key=lambda p: p.stat().st_mtime)
        if not ckpts:
            raise SystemExit(f"{arm}: no checkpoint written")

        from ml_audio_restoration_tpu.config import PipelineConfig
        from ml_audio_restoration_tpu.evaluate import evaluate_stereo
        from ml_audio_restoration_tpu.pipeline import RestorationPipeline
        from ml_audio_restoration_tpu.pipeline.restore import load_stage

        stage = load_stage(str(ckpts[-1]), "stereo")
        pipe = RestorationPipeline(
            stereo=stage, config=PipelineConfig(chunk_seconds=2.0,
                                                overlap_seconds=0.05))
        files = sorted(Path(eval_dir).glob("*.wav"))
        m = evaluate_stereo(pipe, files, sample_rate=22050, seconds=8.0)
        dist = round(abs(m["width_upmix"] - m["width_target"])
                     + abs(m["correlation_upmix"] - m["correlation_target"]),
                     4)
        row = {"arm": arm, "epochs": epochs, "wall_s": round(wall, 1),
               "stats_distance": dist,
               "loss_first3": epoch_losses[:3],
               "loss_last3": epoch_losses[-3:], **m}
        results.append(row)
        print(json.dumps(row), flush=True)

    gap = abs(results[0]["stats_distance"] - results[1]["stats_distance"])
    print(json.dumps({
        "verdict": "certified" if gap <= 0.03 else "DIVERGED",
        "stats_distance_gap": round(gap, 4),
        "noise_bar": 0.03,
        "distances": {r["arm"]: r["stats_distance"] for r in results},
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

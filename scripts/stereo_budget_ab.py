#!/usr/bin/env python
"""Equal-BUDGET stereo training A/B (VERDICT r03 item 3).

The open judgement call from rounds 2-3: the reference trains its stereo
separator on 2-s chunks because of a cuDNN sequence-length limit
(/root/reference/src/training/train_stereo.py:19-22) — our scan LSTM has no
such limit, and 0.5 s x batch-64 bf16 measures 2.9x higher training
throughput (config/stereo_fast_train.yaml). Round 3 only compared at EQUAL
EPOCHS; this script closes the question at equal WALL BUDGET, which is the
decision a user actually faces.

Each arm runs `cli train stereo_separator` (stats-match preset, the
headline stereo quality objective) as a subprocess. The budget clock starts
when the FIRST epoch lands in the metrics JSONL (so one-time compile time
is excluded from both arms); at budget expiry the run gets SIGINT — the
trainer's interrupt path writes a checkpoint before exiting — and the
newest checkpoint is evaluated on the held-out stereo corpus
(evaluate_stereo: upmix width/correlation vs the target statistics).

    python scripts/stereo_budget_ab.py [budget_seconds] [--train-dir D]
        [--eval-dir D]

Prints one JSON line per arm. Adoption rule: the arm whose width/corr land
closer to the target statistics at the same budget wins the default.
"""
from __future__ import annotations

import json
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = {
    "2s_x16": {"batch_size": 16, "chunk_duration": 2.0,
               "compute_dtype": "float32"},
    "0.5s_x64_bf16": {"batch_size": 64, "chunk_duration": 0.5,
                      "compute_dtype": "bfloat16"},
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    budget_s = float(argv.pop(0)) if argv and argv[0][0].isdigit() else 480.0
    train_dir = "data/stereo22"
    eval_dir = "data/eval_stereo22"
    while argv:
        a = argv.pop(0)
        if a == "--train-dir":
            train_dir = argv.pop(0)
        elif a == "--eval-dir":
            eval_dir = argv.pop(0)
        else:
            raise SystemExit(f"unknown arg {a}")

    import yaml

    root = Path(tempfile.mkdtemp(prefix="stereo_ab_"))
    results = []
    for arm, knobs in ARMS.items():
        ckpt_dir = root / arm / "ckpt"
        log_dir = root / arm / "runs"
        overlay = {
            "train": {"model": "stereo_separator",
                      "num_epochs": 100000,  # budget-limited, not epoch-limited
                      "learning_rate": 1.0e-4,
                      "save_every": 1000000,  # only the interrupt checkpoint
                      "stats_match_weight": 1.0,
                      "checkpoint_dir": str(ckpt_dir),
                      "log_dir": str(log_dir),
                      "batch_size": knobs["batch_size"],
                      "compute_dtype": knobs["compute_dtype"]},
            "data": {"data_dir": train_dir, "sample_rate": 22050,
                     "chunk_duration": knobs["chunk_duration"],
                     "val_split": 0.1},
        }
        cfg_path = root / f"{arm}.yaml"
        cfg_path.write_text(yaml.safe_dump(overlay))

        jsonl = log_dir / "stereo_separator" / "stereo_separator.jsonl"

        def epochs_done() -> int:
            # the jsonl FILE exists from trainer setup (before the compile
            # epoch finishes) — only a logged epoch_duration proves a
            # completed epoch, so the budget clock keys on that
            if not jsonl.exists():
                return 0
            return sum(1 for line in jsonl.read_text().splitlines()
                       if '"Time/epoch_duration"' in line)

        proc = subprocess.Popen(
            [sys.executable, "-m", "ml_audio_restoration_tpu.cli", "train",
             "stereo_separator", "--config", str(cfg_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        t_spawn = time.monotonic()
        # budget clock starts at the first COMPLETED epoch (the one-time
        # remote compile is excluded from both arms)
        while epochs_done() == 0:
            if proc.poll() is not None:
                out = proc.stdout.read()
                raise SystemExit(f"{arm}: trainer died before first epoch:\n"
                                 f"{out[-3000:]}")
            if time.monotonic() - t_spawn > 1500:
                proc.kill()
                raise SystemExit(f"{arm}: no epoch after 1500 s (compile "
                                 "stuck or relay outage)")
            time.sleep(2.0)
        t0 = time.monotonic()
        while time.monotonic() - t0 < budget_s and proc.poll() is None:
            time.sleep(2.0)
        if proc.poll() is None:
            proc.send_signal(signal.SIGINT)
            try:
                proc.wait(timeout=900)  # interrupt ckpt + final validation
            except subprocess.TimeoutExpired:
                proc.kill()
        epochs = epochs_done()

        ckpts = sorted(ckpt_dir.rglob("*.msgpack"),
                       key=lambda p: p.stat().st_mtime)
        if not ckpts:
            raise SystemExit(f"{arm}: no checkpoint written")

        # evaluate in THIS process (CPU-safe: the subprocess released the
        # device by now; eval compiles its own small program)
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
        row = {"arm": arm, "budget_s": budget_s, "epochs_logged": epochs,
               "checkpoint": str(ckpts[-1]), **knobs, **m}
        results.append(row)
        print(json.dumps(row), flush=True)

    # distance to target statistics (the stats-match objective)
    for r in results:
        r["stats_distance"] = round(
            abs(r["width_upmix"] - r["width_target"])
            + abs(r["correlation_upmix"] - r["correlation_target"]), 4)
    winner = min(results, key=lambda r: r["stats_distance"])
    print(json.dumps({"winner": winner["arm"],
                      "distances": {r["arm"]: r["stats_distance"]
                                    for r in results}}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

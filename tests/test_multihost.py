"""REAL two-process multi-host training test (VERDICT r02 item 3).

The simulation tests (test_trainer.py::test_process_index_sharding_*) pass
explicit rank/count args; this one actually spawns TWO OS processes that go
through jax.distributed.initialize (local gRPC coordinator, gloo CPU
collectives) and run two epochs of sharded training, then asserts:

- disjoint per-rank data shards whose union is balanced
- bit-identical train/val loss and LR trajectories on both ranks (the
  unsharded-validation contract that keeps plateau-LR decisions in lockstep)
- only rank 0 writes checkpoints and metrics
"""
import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ml_audio_restoration_tpu.audio import save_audio


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    data_dir = tmp_path / "data"
    out_dir = tmp_path / "out"
    data_dir.mkdir()
    out_dir.mkdir()
    rng = np.random.default_rng(0)
    sr = 22050
    for i in range(12):  # 8 train (4/rank -> 2 steps) + 4 val
        t = np.arange(int(sr * 0.2)) / sr
        x = (0.3 * np.sin(2 * np.pi * (180 + 40 * i) * t)
             + 0.02 * rng.normal(size=t.shape)).astype(np.float32)
        save_audio(data_dir / f"f{i}.wav", x[None], sr)

    worker = Path(__file__).parent / "multihost_worker.py"

    def spawn_and_wait():
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(rank), str(port),
                 str(data_dir), str(out_dir)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=str(tmp_path))
            for rank in (0, 1)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=420)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return procs, outs

    procs, outs = spawn_and_wait()
    if any("Gloo context initialization failed" in o
           or "Connect timeout" in o for o in outs):
        # gloo's TCP pair connect can time out when the host is heavily
        # loaded and one rank is starved during startup (observed once on
        # the 1-CPU CI box with the full suite running) — environmental,
        # not a code path under test; retry once on a fresh port
        procs, outs = spawn_and_wait()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f"RANK{rank}_DONE" in out, (
            f"rank {rank} failed:\n{out[-4000:]}")

    r0 = json.loads((out_dir / "rank0.json").read_text())
    r1 = json.loads((out_dir / "rank1.json").read_text())

    # disjoint balanced shards
    assert r0["is_primary"] and not r1["is_primary"]
    s0, s1 = set(r0["shard"]), set(r1["shard"])
    assert s0 and len(s0) == len(s1) and not (s0 & s1)

    # bit-identical loss + LR trajectories across ranks: the gradient
    # all-reduce makes train steps identical, and the deliberately
    # unsharded validation keeps the host-side plateau scheduler in
    # lockstep (parallel/distributed.py, trainer.py::validate)
    assert len(r0["history"]["train_loss"]) == 2
    assert r0["history"] == r1["history"]
    assert all(np.isfinite(v) for v in r0["history"]["train_loss"])

    # rank-0-only writers: checkpoints + metrics exist exactly once, and
    # only rank 0's stdout shows the save
    ckpts = list((out_dir / "ckpt").rglob("*.msgpack"))
    assert ckpts, "rank 0 wrote no checkpoints"
    assert "checkpoint saved" in outs[0]
    assert "checkpoint saved" not in outs[1]
    metrics = list((out_dir / "runs").rglob("*.jsonl"))
    assert len(metrics) == 1  # one writer: rank 0's denoiser.jsonl

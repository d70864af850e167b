"""Worker process for tests/test_multihost.py — NOT a test module.

Runs one rank of a REAL two-process jax.distributed training job on CPU
(2 local devices per process -> 4-device global 'data' mesh), driving the
actual multi-host code paths end-to-end: parallel.distributed.initialize
(the gRPC coordinator + gloo CPU collectives), per-process index sharding,
process-local global-batch assembly (parallel/mesh.py::shard_batch),
XLA-partitioned gradient all-reduce, rank-0-only checkpoint/metric writes,
and the unsharded-validation LR-consistency contract.

Usage: python multihost_worker.py RANK PORT DATA_DIR OUT_DIR
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    rank, port = int(sys.argv[1]), int(sys.argv[2])
    data_dir, out_dir = sys.argv[3], sys.argv[4]

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from ml_audio_restoration_tpu.parallel import distributed as dist

    assert dist.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=rank)
    assert dist.process_count() == 2 and dist.process_index() == rank
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    from ml_audio_restoration_tpu.config import load_config
    from ml_audio_restoration_tpu.data import RestorationDataset
    from ml_audio_restoration_tpu.train.trainer import train_from_config

    cfg = load_config(overrides={
        "train": {"model": "denoiser", "batch_size": 4, "num_epochs": 2,
                  "data_parallel": 4, "seed": 3,
                  "checkpoint_dir": os.path.join(out_dir, "ckpt"),
                  "log_dir": os.path.join(out_dir, "runs")},
        "data": {"data_dir": data_dir, "sample_rate": 22050,
                 "chunk_duration": 0.05, "val_split": 0.34},
    })

    # record this rank's train-index shard for the disjointness assertion
    ds = RestorationDataset(data_dir, 22050, 0.05)
    shard = dist.shard_indices_by_process(list(range(len(ds))))

    # cross-rank agreement primitives (the interrupt/resume safety layer):
    # OR over rank-local flags, and rank-0 string broadcast
    assert dist.agree_flag(rank == 1) is True     # one rank raises the flag
    assert dist.agree_flag(False) is False
    assert dist.broadcast_from_primary(
        "checkpoint_epoch_9.msgpack" if rank == 0 else "WRONG"
    ) == "checkpoint_epoch_9.msgpack"

    history = train_from_config(cfg)

    with open(os.path.join(out_dir, f"rank{rank}.json"), "w") as f:
        json.dump({"rank": rank,
                   "is_primary": dist.is_primary(),
                   "shard": [int(i) for i in shard],
                   "history": history}, f)
    print(f"RANK{rank}_DONE", flush=True)


if __name__ == "__main__":
    main()

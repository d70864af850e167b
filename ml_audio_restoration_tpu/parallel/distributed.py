"""Multi-host (pod-scale) initialization.

The reference's entire distributed story is rsync over ssh to one Jetson
(SURVEY.md §2.7). TPU-native equivalent: jax.distributed for multi-host pods
— each host runs the same program, ICI carries intra-slice collectives, DCN
carries cross-host ones; the Mesh/NamedSharding layer (parallel/mesh.py) is
topology-agnostic on top of this.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize jax.distributed for multi-host training.

    On Cloud TPU VMs all arguments auto-detect from the metadata server; pass
    them explicitly elsewhere (coordinator 'host:port', world size, rank).
    Safe to call when already initialized or single-host (no-op).
    """
    import jax

    explicit = (coordinator_address is not None
                or (num_processes or 0) > 1)
    if not explicit:
        # auto-detect: only a TPU_WORKER_HOSTNAMES list naming MORE than one
        # host implies a pod job (single-host TPU tunnels set it too)
        hosts = [h for h in
                 os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
        if len(hosts) <= 1:
            return False  # single host, nothing to do

    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        if jax.process_count() > 1:
            return True  # already initialized as a multi-process job
        # a detected-or-requested multi-host job that cannot initialize is
        # an error on EVERY rank (silently continuing single-process would
        # mean duplicate writers and a wrong global batch on all ranks)
        raise RuntimeError(
            "distributed.initialize() must run before any other JAX "
            "call (jax.devices, device_put, any computation)")
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return True
        raise


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return process_index() == 0


def global_device_count() -> int:
    import jax

    return jax.device_count()


def shard_indices_by_process(indices, index: Optional[int] = None,
                             count: Optional[int] = None):
    """Disjoint per-host slice of a dataset index list for multi-host DP.

    Every host runs the same program on the same permuted index list; this
    strided slice gives host k indices k, k+P, k+2P, ... so the union over
    hosts is the full epoch and no two hosts read the same file (the
    reference is single-process and has no notion of this; SURVEY.md §2.7).
    The tail is truncated to a common length so all hosts run the same
    number of steps — collectives would deadlock otherwise.
    """
    import numpy as np

    indices = np.asarray(indices)
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    if count <= 1:
        return indices
    per_host = len(indices) // count
    return indices[index::count][:per_host]


def local_batch_size(global_batch_size: int,
                     count: Optional[int] = None) -> int:
    """Per-host loader batch size for a global batch sharded over all hosts'
    devices. The config batch size is GLOBAL; each host feeds its slice."""
    count = process_count() if count is None else count
    if global_batch_size % count:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"process count {count}")
    return global_batch_size // count


def agree_flag(flag: bool) -> bool:
    """Cross-rank OR of a host-side flag (e.g. "was SIGINT delivered to
    THIS host?"). Rank-local control flow that changes the number of
    collective-bearing steps deadlocks every other rank mid-all-reduce, so
    any loop-breaking decision must be agreed. Single-process: identity
    (no collective). Must be called the same number of times on every
    rank."""
    if process_count() <= 1:
        return bool(flag)
    import numpy as np
    from jax.experimental import multihost_utils

    votes = multihost_utils.process_allgather(
        np.asarray([1 if flag else 0], np.int32))
    return bool(np.sum(votes) > 0)


def broadcast_from_primary(s: str, maxlen: int = 256) -> str:
    """Broadcast a short string decided by rank 0 to every rank (non-primary
    ranks' argument is ignored). Used to agree on WHICH checkpoint to
    resume from — per-rank independent choices silently desynchronize the
    replicated training state. Single-process: identity."""
    if process_count() <= 1:
        return s
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(maxlen, np.uint8)
    b = s.encode("utf-8")[:maxlen]
    buf[:len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    # errors="replace": a maxlen truncation can split a multibyte UTF-8
    # sequence; every rank must still decode the same string, not raise
    return bytes(out).rstrip(b"\x00").decode("utf-8", errors="replace")

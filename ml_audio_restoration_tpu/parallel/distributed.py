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

    if num_processes in (None, 1) and coordinator_address is None \
            and "TPU_WORKER_HOSTNAMES" not in os.environ:
        return False  # single host, nothing to do
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


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0


def global_device_count() -> int:
    import jax

    return jax.device_count()

"""Mesh construction + sharding for multi-chip training/inference."""

from .distributed import (
    initialize,
    is_primary,
    global_device_count,
    process_index,
    process_count,
    shard_indices_by_process,
    local_batch_size,
)
from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    time_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "time_sharding",
    "initialize",
    "is_primary",
    "global_device_count",
    "process_index",
    "process_count",
    "shard_indices_by_process",
    "local_batch_size",
]

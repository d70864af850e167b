"""Mesh construction + sharding for multi-chip training/inference."""

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
]

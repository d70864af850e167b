"""Device mesh + sharding layer.

The reference has no multi-device story at all (SURVEY.md §2.7: zero
DDP/NCCL/MPI hits; "multi-node" is rsync over ssh). This module defines the
TPU-native one:

- axes: ('data', 'model'). Data parallelism shards the batch. The 'model'
  axis carries SEQUENCE parallelism: the serving pipeline shards each
  chunk's TIME axis over it (pipeline/restore.py sharding constraint,
  time_sharding below) — XLA inserts the conv halo exchanges — which is how
  one very long recording scales past a chip (whole_file + data=1,
  model=N). Weight-matrix tensor parallelism stays off BY DESIGN at these
  model sizes: the largest family is 676K params (2.7 MB f32), so a TP
  shard would move more bytes in per-layer activation collectives than the
  whole weight set; for audio models the scalable dimensions are batch
  (chunks/streams) and time, and both are covered. Revisit only if a model
  family outgrows single-chip HBM (~16 GB), i.e. >4B params.
- Train steps are jit-compiled with NamedShardings: batch sharded on 'data',
  parameters replicated. Under SPMD-by-sharding, gradient all-reduce AND
  cross-device batch-norm statistics come out of XLA's partitioner
  automatically — jnp.mean over a sharded batch axis IS sync-BN (collectives
  ride ICI; nothing like the reference's absent NCCL plumbing is needed).
- Works identically on 1 real chip, N virtual CPU devices
  (--xla_force_host_platform_device_count), or a real pod slice.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_parallel: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the first dp*mp devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data_parallel is None:
        data_parallel = max(1, len(devices) // model_parallel)
    n = data_parallel * model_parallel
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available")
    grid = np.asarray(devices[:n]).reshape(data_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of [B, ...] host arrays with batch sharded.

    Single-host: B is the global batch, device_put scatters it. Multi-host:
    each process holds only its LOCAL slice of the global batch (the loader
    is index-sharded per host, parallel/distributed.py), and the global
    array is assembled process-locally — no host ever materializes the full
    batch."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def time_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the time axis of [B, T, C] over 'model' — sequence-parallel
    inference for very long recordings (convs need halo exchange, which
    XLA inserts from this sharding automatically)."""
    return NamedSharding(mesh, P(None, "model", None))

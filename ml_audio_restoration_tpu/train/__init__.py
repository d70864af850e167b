"""Training runtime: trainer loop, checkpoints, metrics."""

from .checkpoints import (
    save_checkpoint,
    load_checkpoint,
    load_native,
    latest_checkpoint,
    cleanup_old_epochs,
    epoch_checkpoint_name,
    AsyncCheckpointer,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_native",
    "latest_checkpoint",
    "cleanup_old_epochs",
    "epoch_checkpoint_name",
    "AsyncCheckpointer",
]

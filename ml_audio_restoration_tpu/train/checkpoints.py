"""Checkpointing: native msgpack pytree checkpoints + retention policy.

Capability parity with the reference's checkpoint story
(/root/reference/src/training/trainer.py:724-761): a checkpoint carries
{epoch, model params+state, optimizer state, scheduler state, best_val_loss,
history}; retention keeps only the latest epoch checkpoint plus best_model;
entry points auto-resume from the newest checkpoint.

Format: flax.serialization msgpack of a nested dict — single file, atomic
rename, no torch dependency. Reference .pth files are read through
compat.torch_loader instead (pipeline dispatches on extension).
"""
from __future__ import annotations

import os
import re
import tempfile
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path, payload: dict):
    """Atomically serialize a pytree dict to `path`."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = jax.tree_util.tree_map(
        lambda x: x if isinstance(x, (str, bytes, int, float)) else np.asarray(x),
        payload)
    data = serialization.msgpack_serialize(payload)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            # fsync before the rename, else "atomic" only holds against
            # process crashes: on a power loss / kernel crash the renamed
            # file can land with torn or zero-length contents (ext4/xfs
            # delayed allocation), and retention has already deleted the
            # older epoch checkpoints that would have been the fallback
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        # also persist the directory entry (the rename itself)
        dfd = os.open(path.parent, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(path) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class AsyncCheckpointer:
    """Async checkpoint writes: snapshot to host, serialize on a background
    thread so the train loop never blocks on disk (the orbax-style pattern;
    the reference's torch.save is fully synchronous, trainer.py:727).

    Failure contract: a background write error is re-raised to the caller
    at the NEXT save()/wait() — never swallowed (training must not run for
    hours believing checkpoints exist when the disk is full). `on_done`
    runs on the worker thread only after the atomic rename lands, so
    retention cleanup can't delete old checkpoints while the new one is
    still in flight; an on_done failure surfaces as a warning, NOT an
    error — the checkpoint exists, and a cosmetic cleanup failure must
    not kill (or mislabel) a long run. Callers must wait() before process exit (the thread
    is daemonic so a hung disk can't block interpreter shutdown forever)."""

    def __init__(self):
        import threading

        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    def save(self, path, payload: dict, on_done=None):
        import threading

        # device->host snapshot happens HERE (before params can be donated
        # away by the next step); only serialization/IO is deferred
        snapshot = jax.tree_util.tree_map(
            lambda x: x if isinstance(x, (str, bytes, int, float))
            else np.asarray(x), payload)
        self.wait()

        def run():
            try:
                save_checkpoint(path, snapshot)
            except BaseException as e:
                self._error = e
                return
            try:
                if on_done is not None:
                    on_done()
            except BaseException as e:
                # the checkpoint IS on disk; a retention/cleanup failure
                # must not abort training with a message claiming the
                # write failed
                import warnings

                warnings.warn(f"checkpoint retention failed for "
                              f"{path}: {e!r}")

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return path

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError(
                "async checkpoint write failed (the checkpoint it reported "
                "saving does NOT exist on disk)") from e


def load_native(path, model: str | None = None):
    """Load (params, state) from a native checkpoint file.

    `model` is accepted for signature symmetry with compat.load_model; the
    checkpoint is self-describing so it is unused.
    """
    ckpt = load_checkpoint(path)
    return ckpt["params"], ckpt["model_state"]


_EPOCH_RE = re.compile(r"checkpoint_epoch_(\d+)\.msgpack$")


def epoch_checkpoint_name(epoch: int) -> str:
    return f"checkpoint_epoch_{epoch}.msgpack"


def cleanup_old_epochs(checkpoint_dir, keep_path):
    """Keep only `keep_path` among epoch checkpoints (trainer.py:737-743)."""
    keep = Path(keep_path)
    for p in Path(checkpoint_dir).glob("checkpoint_epoch_*.msgpack"):
        if p != keep:
            p.unlink(missing_ok=True)  # raced external cleanup is fine


def all_checkpoints(checkpoint_dir):
    """Resume candidates, best-first: epoch checkpoints newest-first, then
    best_model. Empty list if none."""
    d = Path(checkpoint_dir)
    if not d.is_dir():
        return []
    epochs = []
    for p in d.glob("checkpoint_epoch_*.msgpack"):
        m = _EPOCH_RE.search(p.name)
        if m:
            epochs.append((int(m.group(1)), p))
    out = [p for _, p in sorted(epochs, reverse=True)]
    best = d / "best_model.msgpack"
    if best.exists():
        out.append(best)
    return out


def latest_checkpoint(checkpoint_dir):
    """Newest epoch checkpoint, else best_model, else None — the reference's
    auto-resume discovery (train_denoiser.py:130-156)."""
    cands = all_checkpoints(checkpoint_dir)
    return cands[0] if cands else None

"""Batching data loader with background prefetch.

The reference trains with torch DataLoader(num_workers=0) — every batch's
file I/O and host-side DSP is serialized with the device step
(/root/reference/src/training/train_denoiser.py:25,64-78). Here batches are
decoded/normalized ahead of the training loop into a bounded queue, so the
TPU never waits on the host. (Degradation itself is on-device —
data/artifacts.py — so host work is just file reads.)

Where the parallelism lives: one background thread pipelines whole batches,
and WITHIN a batch the native C++ decoder fans the chunk reads across
`num_workers` OS threads with the GIL released (datasets expose `getitems`;
native/wavio.cpp). The pure-python fallback decodes a batch sequentially on
the background thread ON PURPOSE: datasets draw random chunk starts from one
seeded generator, and item-level Python threading would both race the
generator and make batch contents scheduling-dependent — the data-parallel
equality tests (and resumable runs) rely on seeded loaders being
deterministic.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np


def collate(items: Sequence[dict]) -> dict:
    """Stack a list of {key: array|scalar} into {key: [B, ...]}."""
    out = {}
    for key in items[0]:
        out[key] = np.stack([np.asarray(it[key]) for it in items])
    return out


class DataLoader:
    """Iterates batches over a dataset with shuffling and prefetch.

    drop_last=True keeps batch shapes static (one jit compilation).
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 4, prefetch: int = 4,
                 drop_last: bool = True,
                 indices: Optional[Sequence[int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.indices = (np.asarray(indices) if indices is not None
                        else np.arange(len(dataset)))
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.indices) // self.batch_size
        if not self.drop_last and len(self.indices) % self.batch_size:
            n += 1
        return max(n, 0)

    def _batches(self):
        order = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(0, len(order) - (self.batch_size - 1
                                        if self.drop_last else 0),
                       self.batch_size):
            yield order[i:i + self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        batches = list(self._batches())
        if not batches:
            return iter(())
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        getitems = getattr(self.dataset, "getitems", None)

        def put(item) -> bool:
            # an abandoned iterator (break mid-epoch, next(iter(...), None))
            # stops draining the bounded queue; a plain q.put would then
            # block this worker thread FOREVER, leaking it plus ~prefetch
            # collated batches per abandoned iterator — poll the stop flag
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    if getitems is not None:
                        items = getitems([int(j) for j in batch_idx],
                                         threads=self.num_workers)
                    else:
                        items = [self.dataset[int(j)] for j in batch_idx]
                    if not put(collate(items)):
                        return
                put(None)
            except BaseException as e:  # surfaced on the consumer side
                put(e)

        t = threading.Thread(target=worker, daemon=True)

        def gen():
            # started HERE, not in __iter__: an iterator that is created but
            # never advanced never runs this body, so its finally (the stop
            # flag) would never fire and an eagerly-started worker would spin
            # on the full queue forever
            t.start()
            try:
                while True:
                    item = q.get()
                    if item is None:
                        return
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop.set()

        return gen()


def train_val_split(dataset, val_fraction: float, seed: int = 0):
    """Random 90/10-style index split (reference train_denoiser.py:54-58)."""
    n = len(dataset)
    order = np.random.default_rng(seed).permutation(n)
    n_val = int(n * val_fraction)
    return order[n_val:], order[:n_val]


def prepare_dataset(data_dir, batch_size: int = 16, num_workers: int = 4,
                    **dataset_kwargs) -> DataLoader:
    """Convenience: RestorationDataset + shuffling DataLoader (API parity
    with reference prepare_dataset, preprocessing.py:216-236)."""
    from .datasets import RestorationDataset

    dataset = RestorationDataset(data_dir, **dataset_kwargs)
    return DataLoader(dataset, batch_size, shuffle=True,
                      num_workers=num_workers)

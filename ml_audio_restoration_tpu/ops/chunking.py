"""Vectorized chunking + overlap-add for long-signal inference.

The reference processes long audio with a sequential Python loop over
non-overlapping 2-s chunks and accepts seam artifacts
(/root/reference/src/training/trainer.py:652-681; chunk_audio at
/root/reference/src/utils/audio_processing.py:229 supports overlap but is
never used). TPU-native replacement: frame the whole recording into a
*batch* of overlapping chunks, push the batch through the jitted model once
(MXU stays full, one dispatch), and crossfade the seams with a COLA
overlap-add.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def num_chunks(length: int, chunk_size: int, hop: int) -> int:
    if length <= chunk_size:
        return 1
    return 1 + int(np.ceil((length - chunk_size) / hop))


def chunk_signal(x, chunk_size: int, hop: int):
    """Frame [C, T] into [N, C, chunk_size] (zero-padded tail).

    Returns (chunks, original_length). Static shapes: N is a Python int.
    """
    c, t = x.shape
    n = num_chunks(t, chunk_size, hop)
    total = (n - 1) * hop + chunk_size
    xp = jnp.pad(x, ((0, 0), (0, total - t)))
    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(chunk_size)[None, :]
    return jnp.transpose(xp[:, idx], (1, 0, 2)), t


def crossfade_window(chunk_size: int, overlap: int, dtype=jnp.float32):
    """Trapezoid window: linear ramps of `overlap` samples at both ends.

    Overlapping trapezoids sum to 1 when hop = chunk_size - overlap; edge
    effects are removed by the weight normalization in overlap_add.
    """
    if overlap <= 0:
        return jnp.ones((chunk_size,), dtype)
    ramp = (jnp.arange(overlap, dtype=dtype) + 1.0) / (overlap + 1.0)
    body = jnp.ones((chunk_size - 2 * overlap,), dtype)
    return jnp.concatenate([ramp, body, ramp[::-1]])


def overlap_add(chunks, hop: int, length: int, *, overlap: int = 0):
    """Reassemble [N, C, chunk_size] into [C, length] with crossfade.

    `overlap` is chunk_size - hop; each chunk is weighted by a trapezoid
    window and the output normalized by the accumulated window sum, so any
    chunk/hop combination (including the reference's hop == chunk_size) is
    exact.
    """
    n, c, chunk_size = chunks.shape
    win = crossfade_window(chunk_size, overlap, chunks.dtype)
    total = (n - 1) * hop + chunk_size
    idx = (jnp.arange(n) * hop)[:, None] + jnp.arange(chunk_size)[None, :]
    flat_idx = idx.reshape(-1)

    weighted = (chunks * win[None, None, :]).transpose(1, 0, 2).reshape(c, -1)
    out = jnp.zeros((c, total), chunks.dtype).at[:, flat_idx].add(weighted)
    norm = jnp.zeros((total,), chunks.dtype).at[flat_idx].add(
        jnp.tile(win, (n,))
    )
    return (out / jnp.maximum(norm, 1e-12))[:, :length]

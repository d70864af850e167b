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


def overlap_add(chunks, hop: int, length: int, *, overlap: int = 0,
                valid=None):
    """Reassemble [N, C, chunk_size] into [C, length] with crossfade.

    `overlap` is chunk_size - hop; each chunk is weighted by a trapezoid
    window and the output normalized by the accumulated window sum, so any
    chunk/hop combination (including the reference's hop == chunk_size) is
    exact.

    `valid` (traced scalar, optional): number of REAL chunks — chunks with
    index >= valid are chunk-count-bucketing padding and get zero crossfade
    weight in both the output and the normalizer, so the bucketed result is
    exactly the unbucketed one on the real region (padding chunks see
    mostly-zero input windows; without masking their model output would be
    crossfaded at up-to-full weight into the last `overlap` real samples).

    TPU note: implemented with reshapes + one shifted add, NOT scatter-add —
    requires overlap <= hop (every output sample touched by at most two
    chunks), which holds for any sane chunking. XLA lowers scatters with
    serialization guarantees that cost ~0.5 s on a 2-minute recording; this
    formulation is pure vector math.
    """
    n, c, chunk_size = chunks.shape
    if hop > chunk_size or (chunk_size - hop) != overlap:
        raise ValueError("expect chunk_size = hop + overlap")
    if overlap > hop:
        raise ValueError("overlap must be <= hop (each sample in <=2 chunks)")
    win = crossfade_window(chunk_size, overlap, chunks.dtype)
    total = (n - 1) * hop + chunk_size
    weighted = chunks * win[None, None, :]
    mask = None
    if valid is not None:
        mask = (jnp.arange(n) < valid).astype(chunks.dtype)[:, None, None]
        weighted = weighted * mask

    if overlap == 0:
        out = weighted.transpose(1, 0, 2).reshape(c, n * chunk_size)
        return out[:, :length]

    body = weighted[:, :, :hop]    # [N, C, hop]
    tail = weighted[:, :, hop:]    # [N, C, overlap] — lands in the next body
    flat_body = body.transpose(1, 0, 2).reshape(c, n * hop)
    flat_body = jnp.pad(flat_body, ((0, 0), (0, overlap)))  # [C, total]
    tail_padded = jnp.pad(tail, ((0, 0), (0, 0), (0, hop - overlap)))
    flat_tail = tail_padded.transpose(1, 0, 2).reshape(c, n * hop)
    shifted_tail = jnp.pad(flat_tail, ((0, 0), (hop, 0)))[:, :total]
    out = flat_body + shifted_tail

    # window-sum normalization (same construction on a constant -> folded)
    ones = jnp.broadcast_to(win[None, None, :], (n, 1, chunk_size))
    if mask is not None:
        ones = ones * mask
    nb = ones[:, :, :hop].transpose(1, 0, 2).reshape(1, n * hop)
    nb = jnp.pad(nb, ((0, 0), (0, overlap)))
    nt = jnp.pad(ones[:, :, hop:], ((0, 0), (0, 0), (0, hop - overlap)))
    nt = nt.transpose(1, 0, 2).reshape(1, n * hop)
    nt = jnp.pad(nt, ((0, 0), (hop, 0)))[:, :total]
    norm = nb + nt
    return (out / jnp.maximum(norm, 1e-12))[:, :length]


def frame_structured(audio, n_chunks: int, chunk_size: int, hop: int):
    """Frame padded [C, total] into [N, chunk_size, C] WITHOUT a gather:
    chunk i = body rows of a [N, hop] reshape + the head of row i+1.
    Requires overlap = chunk_size - hop <= hop and
    audio.shape[1] == (n_chunks-1)*hop + chunk_size."""
    c = audio.shape[0]
    overlap = chunk_size - hop
    if overlap == 0:
        return audio.reshape(c, n_chunks, chunk_size).transpose(1, 2, 0)
    if overlap > hop:
        raise ValueError("overlap must be <= hop")
    body = audio[:, :n_chunks * hop].reshape(c, n_chunks, hop)
    # head of the next row; final chunk's head comes from the padded tail
    next_head = jnp.concatenate(
        [audio[:, hop:n_chunks * hop].reshape(c, n_chunks - 1, hop),
         audio[:, n_chunks * hop:][:, None, :hop]
         if audio.shape[1] - n_chunks * hop >= hop
         else jnp.pad(audio[:, n_chunks * hop:],
                      ((0, 0), (0, hop - (audio.shape[1] - n_chunks * hop)))
                      )[:, None, :]],
        axis=1)  # [C, N, hop]
    chunks = jnp.concatenate([body, next_head[:, :, :overlap]], axis=-1)
    return chunks.transpose(1, 2, 0)  # [N, chunk, C]

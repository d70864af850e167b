"""ctypes bindings for the native WAV codec / batch chunk reader
(native/wavio.cpp). Auto-builds the shared library with g++ on first use
(cached next to the source); every call degrades gracefully to the numpy
codec when the toolchain or library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libwavio.so"
_lib = None
_load_attempted = False


def _build() -> bool:
    srcs = [_NATIVE_DIR / "wavio.cpp", _NATIVE_DIR / "flacio.cpp"]
    if not all(s.exists() for s in srcs):
        return False
    # link to a unique temp name, then rename: linking at the final path
    # (a) truncates an inode that may still be dlopen'd (clobbering live
    # mappings), and (b) races concurrent processes (DataLoader workers)
    # whose mid-link CDLL would read a half-written ELF and silently pin
    # themselves to the slow pure-Python codec. rename is atomic.
    tmp = _LIB_PATH.with_suffix(f".so.build{os.getpid()}")
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
             "-shared", "-o", str(tmp)] + [str(s) for s in srcs],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def load_library():
    """-> ctypes CDLL or None."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("MLAR_DISABLE_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    if not hasattr(lib, "wavio_has_flac"):
        # stale pre-FLAC build: rebuild (to a NEW inode — the old handle
        # stays mapped; `del lib` never dlcloses) and reload. Re-check the
        # symbol: glibc can dedup a CDLL of the same path to the stale
        # handle unless the inode actually changed.
        del lib
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        if not hasattr(lib, "wavio_has_flac"):
            return None

    lib.wavio_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.wavio_info.restype = ctypes.c_int
    lib.wavio_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.wavio_read.restype = ctypes.c_int64
    lib.wavio_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int, ctypes.c_int]
    lib.wavio_read_batch.restype = ctypes.c_int
    lib.wavio_write_pcm16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int]
    lib.wavio_write_pcm16.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


def info(path) -> Optional[dict]:
    lib = load_library()
    if lib is None:
        return None
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = ctypes.c_int64()
    bits = ctypes.c_int32()
    fmt = ctypes.c_int32()
    rc = lib.wavio_info(str(path).encode(), ctypes.byref(sr),
                        ctypes.byref(ch), ctypes.byref(frames),
                        ctypes.byref(bits), ctypes.byref(fmt))
    if rc != 0:
        return None
    return {"sample_rate": sr.value, "channels": ch.value,
            "frames": frames.value, "bits": bits.value, "fmt": fmt.value}


def read(path, start: int = 0, frames: int = -1, mono: bool = False):
    """-> (float32 [T, C] or [T] if mono, sample_rate) or None on failure."""
    lib = load_library()
    if lib is None:
        return None
    meta = info(path)
    if meta is None:
        return None
    total = meta["frames"]
    start = max(0, min(start, total))
    n = total - start if frames < 0 else min(frames, total - start)
    ch = 1 if mono else meta["channels"]
    # zeros, not empty: a decoder returning fewer samples than counted
    # (crafted seektable, gap in frame numbering) must surface silence,
    # never uninitialized process memory as audio
    out = np.zeros(n * ch, np.float32)
    got = lib.wavio_read(str(path).encode(), start, n, int(mono),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        return None
    out = out[:got * ch]
    data = out if mono else out.reshape(-1, meta["channels"])
    return data, meta["sample_rate"]


def read_batch_mono(paths: Sequence, starts: Sequence[int], frames: int,
                    threads: int = 8):
    """Parallel mono chunk decode -> float32 [N, frames] (zero-padded) or
    None. The data-loader hot path: one C call, no GIL."""
    lib = load_library()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, frames), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_starts = (ctypes.c_int64 * n)(*[int(s) for s in starts])
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(*[
        out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        for i in range(n)])
    rc = lib.wavio_read_batch(c_paths, c_starts, frames, 1, ptrs, n, threads)
    if rc != 0:
        return None
    return out


def write_pcm16(path, data: np.ndarray, sample_rate: int) -> bool:
    lib = load_library()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float32)
    if data.ndim == 1:
        data = data[:, None]
    frames, ch = data.shape
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    rc = lib.wavio_write_pcm16(
        str(path).encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, ch, sample_rate)
    return rc == 0

"""Native (C++) data-plane helpers, built on first use with the system g++.

`chunkdec` parallelizes zarr chunk decompression (blosc/zlib) across a
thread pool outside the GIL — the host-side input pipeline's hot loop when
reading compressed training data. Falls back silently to the pure-Python
path when no compiler or libblosc is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libchunkdec.so")
_lock = threading.Lock()
_lib = None
_tried = False

CODEC_RAW, CODEC_BLOSC, CODEC_ZLIB = 0, 1, 2


def _build() -> bool:
    src = os.path.join(_HERE, "chunkdec.cpp")
    # only versioned .so files ship on this image (no -dev symlinks)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO_PATH, src, "-l:libblosc.so.1", "-l:libz.so.1", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """The loaded ctypes library, or None when unavailable."""
    global _lib, _tried
    if os.environ.get("NLT_NO_NATIVE"):  # benchmarking / debugging escape
        return None
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_HERE, "chunkdec.cpp"))
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.decode_chunks.restype = ctypes.c_int
        lib.decode_chunks.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        _lib = lib
    return _lib


def decode_chunks_parallel(buffers: list, codecs: list, chunk_nbytes: int,
                           n_threads: int = 0) -> np.ndarray | None:
    """Decode compressed chunk `buffers` (list of bytes) concurrently.

    codecs: per-chunk codec ids (CODEC_*). Returns a flat uint8 array of
    len(buffers) * chunk_nbytes, or None if the native library is
    unavailable (caller falls back to Python decoding).
    """
    lib = get_lib()
    if lib is None:
        return None
    if n_threads <= 0:
        # NLT_DECODE_THREADS: per-call thread budget, set by pooled loaders
        # so num_workers concurrent decodes don't oversubscribe the cores
        n_threads = int(os.environ.get("NLT_DECODE_THREADS", "0") or 0)
    n = len(buffers)
    out = np.empty(n * chunk_nbytes, dtype=np.uint8)
    src_arr = (ctypes.c_char_p * n)(*buffers)
    size_arr = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
    codec_arr = (ctypes.c_int32 * n)(*codecs)
    rc = lib.decode_chunks(
        ctypes.cast(src_arr, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(size_arr, ctypes.POINTER(ctypes.c_int64)),
        ctypes.cast(codec_arr, ctypes.POINTER(ctypes.c_int32)),
        n,
        out.ctypes.data_as(ctypes.c_char_p),
        chunk_nbytes,
        n_threads,
    )
    if rc != 0:
        raise ValueError(f"native chunk decode failed (code {rc})")
    return out

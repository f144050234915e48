"""Native (C++) helpers, loaded via ctypes.

``framecache.cc`` is compiled on demand with the system toolchain
(g++ -O3 -shared -fPIC -ljpeg) into a per-user cache directory, then bound
with ctypes — no pybind11 / build-system dependency. Every entry point here
degrades gracefully: if the toolchain or libjpeg is missing, callers fall
back to the pure-OpenCV path (data/video.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "framecache.cc"
_ABI = 1

_lock = threading.Lock()
_lib = None
_tried = False


def _cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    d = Path(base) / "deepgraphpose_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src + str(_ABI).encode()).hexdigest()[:16]
    out = _cache_dir() / f"framecache_{tag}.so"
    if out.exists():
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(out), "-ljpeg", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        print(f"[native] framecache build failed ({e}); using OpenCV path")
        return None
    return out


def load_framecache_lib():
    """The compiled framecache library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
            if lib.fc_abi_version() != _ABI:
                return None
            lib.fc_decode_batch.restype = ctypes.c_int
            lib.fc_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            _lib = lib
        except OSError as e:  # pragma: no cover - load failure
            print(f"[native] framecache load failed ({e})")
            _lib = None
        return _lib


def decode_jpeg_batch(jpegs: list[bytes], h: int, w: int,
                      threads: int = 0) -> np.ndarray | None:
    """Decode a list of JPEG byte strings to (n, h, w, 3) RGB uint8.

    Returns None when the native library is unavailable or any frame fails
    (callers fall back to OpenCV).
    """
    lib = load_framecache_lib()
    if lib is None or not jpegs:
        return None
    n = len(jpegs)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    buf_arr = (ctypes.c_char_p * n)(*jpegs)
    size_arr = (ctypes.c_size_t * n)(*[len(b) for b in jpegs])
    failures = lib.fc_decode_batch(
        ctypes.cast(buf_arr, ctypes.POINTER(ctypes.c_char_p)), size_arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, threads)
    if failures:
        return None
    return out

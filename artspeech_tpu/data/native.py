"""ctypes bindings for the native (C++) batch contour loader.

Wraps native/libcontour_loader.so: one call loads, scales and resamples a
whole batch of .npy contour files on a thread pool — the data layer's
IO-bound hot path. Builds the library on first use if g++ is available;
every caller must handle ``available() == False`` and fall back to the
Python loader (artspeech_tpu.data.loaders).
"""

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_NAME = "libcontour_loader.so"
_last_error: Optional[str] = None


def last_error() -> Optional[str]:
    """Why the native loader is unavailable (None when it loaded fine)."""
    _load_library()
    return _last_error


def _build(lib_path: str, src: str) -> Optional[str]:
    """Compile the library; returns an error string or None on success."""
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
             "-shared", "-o", lib_path, src],
            check=True,
            capture_output=True,
            text=True,
        )
        return None
    except subprocess.CalledProcessError as exc:
        return f"g++ failed (rc={exc.returncode}): {exc.stderr[-2000:]}"
    except Exception as exc:
        return f"build failed: {type(exc).__name__}: {exc}"


@lru_cache(maxsize=1)
def _load_library() -> Optional[ctypes.CDLL]:
    global _last_error
    lib_path = os.path.abspath(os.path.join(_NATIVE_DIR, _LIB_NAME))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "contour_loader.cpp"))
    if not os.path.isfile(lib_path):
        if not os.path.isfile(src):
            _last_error = f"source not found: {src}"
            return None
        err = _build(lib_path, src)
        if err is not None:
            _last_error = err
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError as exc:
        # A stale/foreign-ABI .so (e.g. built on another machine): rebuild
        # from source once before giving up.
        if not os.path.isfile(src):
            _last_error = f"dlopen failed and no source to rebuild: {exc}"
            return None
        err = _build(lib_path, src)
        if err is not None:
            _last_error = f"dlopen failed ({exc}); rebuild failed: {err}"
            return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError as exc2:
            _last_error = f"dlopen failed after rebuild: {exc2}"
            return None
    _last_error = None
    lib.load_contours_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.load_contours_batch.restype = None
    return lib


def available() -> bool:
    return _load_library() is not None


def load_contour_batch(
    paths: Sequence[str],
    norm_value: float,
    n_samples: int = 50,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load a batch of contour npys natively.

    Returns:
        (contours, ok, orig_lengths): (len(paths), 2, n_samples) float32
        scaled by 1/norm_value, a boolean success mask, and each file's
        original point count. Raises RuntimeError if the native library is
        unavailable.
    """
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native contour loader unavailable")
    n = len(paths)
    out = np.empty((n, 2, n_samples), np.float32)
    ok = np.zeros((n,), np.uint8)
    orig = np.zeros((n,), np.int64)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.load_contours_batch(
        c_paths,
        n,
        n_samples,
        ctypes.c_float(norm_value),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
        orig.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out, ok.astype(bool), orig

"""ctypes binding for the native IO runtime (native/libocmio.so).

Provides the C++ fast path for WAV decode and threaded batch decode with
repeat-pad/crop; occm_tpu.io.wav falls back to pure NumPy when the library
has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.environ.get(
        "OCM_NATIVE_LIB", os.path.join(_NATIVE_DIR, "libocmio.so")
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.ocm_read_wav.restype = ctypes.c_int
    lib.ocm_read_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ocm_read_wav_padded.restype = ctypes.c_int
    lib.ocm_read_wav_padded.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ocm_read_batch_padded.restype = ctypes.c_int
    lib.ocm_read_batch_padded.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.ocm_free.restype = None
    lib.ocm_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def native_read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode a WAV via the C++ runtime. Raises if unavailable or on error."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.ocm_read_wav(path.encode(), ctypes.byref(out),
                          ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"ocm_read_wav({path}) failed rc={rc}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.ocm_free(out)
    return arr, sr.value


def native_read_batch_padded(
    paths: List[str], max_len: int, n_threads: int = 4
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded batch decode + repeat-pad/crop -> ([B, max_len] float32,
    valid_lens [B] int64, srs [B] int32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    count = len(paths)
    out = np.empty((count, max_len), np.float32)
    valid = np.empty((count,), np.int64)
    srs = np.empty((count,), np.int32)
    c_paths = (ctypes.c_char_p * count)(*[p.encode() for p in paths])
    rc = lib.ocm_read_batch_padded(
        c_paths, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len,
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    if rc != 0:
        raise IOError(f"ocm_read_batch_padded failed rc={rc}")
    return out, valid, srs

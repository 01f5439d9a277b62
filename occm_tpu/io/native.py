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
    # FLAC extras (round 2): CRC toggle, seektable, ranged + streaming reads
    lib.ocm_set_flac_crc.restype = None
    lib.ocm_set_flac_crc.argtypes = [ctypes.c_int]
    lib.ocm_flac_seek_points.restype = ctypes.c_int
    lib.ocm_flac_seek_points.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
    ]
    lib.ocm_read_flac_range.restype = ctypes.c_int
    lib.ocm_read_flac_range.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ocm_flac_open.restype = ctypes.c_void_p
    lib.ocm_flac_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ocm_flac_read.restype = ctypes.c_int64
    lib.ocm_flac_read.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.ocm_flac_close.restype = None
    lib.ocm_flac_close.argtypes = [ctypes.c_void_p]
    lib.ocm_read_audio_range.restype = ctypes.c_int
    lib.ocm_read_audio_range.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    # r5 additions: header-only length probes (the scoring fast lane
    # buckets by true length without decoding)
    lib.ocm_audio_len.restype = ctypes.c_int
    lib.ocm_audio_len.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ocm_audio_len_batch.restype = ctypes.c_int
    lib.ocm_audio_len_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
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


def native_audio_len(path: str) -> Tuple[int, int]:
    """Header-only (sample count, sample rate) of a WAV/FLAC file — no
    decode. Raises when the headers do not carry the length (e.g. FLAC
    with STREAMINFO total_samples=0); callers decode instead."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.ocm_audio_len(path.encode(), ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"ocm_audio_len({path}) failed rc={rc}")
    return n.value, sr.value


def native_audio_len_batch(
    paths: List[str], n_threads: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded header-only length probe -> (lens [B] int64, srs [B]
    int32). lens[i] == -1 marks a file whose length could not be probed
    (the caller decodes those); a missing file surfaces the same way."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    count = len(paths)
    lens = np.empty((count,), np.int64)
    srs = np.empty((count,), np.int32)
    if count == 0:
        return lens, srs
    c_paths = (ctypes.c_char_p * count)(*[p.encode() for p in paths])
    lib.ocm_audio_len_batch(
        c_paths, count,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    return lens, srs


def set_flac_crc_verify(enable: bool) -> None:
    """Toggle CRC-8/CRC-16 verification in the native FLAC decoder
    (default ON; the Python oracle in occm_tpu.io.flac always verifies)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    lib.ocm_set_flac_crc(1 if enable else 0)


def flac_seek_points(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """SEEKTABLE of a FLAC file -> (samples [N], byte offsets [N]).
    Offsets are relative to the first audio frame. Empty arrays when the
    file has no seektable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    cap = 4096
    while True:
        samples = np.empty((cap,), np.int64)
        offsets = np.empty((cap,), np.int64)
        n = lib.ocm_flac_seek_points(
            path.encode(),
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap,
        )
        if n < 0:
            raise IOError(f"ocm_flac_seek_points({path}) failed rc={n}")
        if n <= cap:
            return samples[:n].copy(), offsets[:n].copy()
        # dense seektable larger than the buffer: the C side clamps writes
        # to cap but returns the true count — re-call with a full buffer
        # instead of silently truncating
        cap = n


def native_read_flac_range(path: str, start: int, count: int
                           ) -> Tuple[np.ndarray, int]:
    """Decode samples [start, start+count) of a FLAC file, seeking via the
    SEEKTABLE when present -> (float32 [n<=count], sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    out = np.empty((count,), np.float32)
    got = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.ocm_read_flac_range(
        path.encode(), start, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(got), ctypes.byref(sr),
    )
    if rc != 0:
        raise IOError(f"ocm_read_flac_range({path}) failed rc={rc}")
    return out[: got.value].copy(), sr.value


class FlacStream:
    """Streaming FLAC reader over the native decoder: constant memory per
    read, frame-at-a-time decode (for long eval audio / future online
    serving). Use as a context manager."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library not built (make -C native)")
        self._lib = lib
        sr = ctypes.c_int()
        total = ctypes.c_int64()
        self._h = lib.ocm_flac_open(path.encode(), ctypes.byref(sr),
                                    ctypes.byref(total))
        if not self._h:
            raise IOError(f"ocm_flac_open({path}) failed")
        self.sample_rate = sr.value
        self.total_samples = total.value  # 0 = unknown

    def read(self, count: int) -> np.ndarray:
        """Next `count` samples (shorter at EOF, empty when exhausted)."""
        if self._h is None:
            raise ValueError("stream closed")
        out = np.empty((count,), np.float32)
        n = self._lib.ocm_flac_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            count,
        )
        if n < 0:
            raise IOError(f"ocm_flac_read failed rc={n}")
        return out[:n].copy()

    def close(self) -> None:
        if self._h is not None:
            self._lib.ocm_flac_close(self._h)
            self._h = None

    def __enter__(self) -> "FlacStream":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def native_read_audio_range(path: str, start: int, count: int
                            ) -> Tuple[np.ndarray, int]:
    """Decode samples [start, start+count) of a WAV or FLAC file (FLAC
    seeks via the SEEKTABLE when present) -> (float32 [n<=count], sr)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    out = np.empty((count,), np.float32)
    got = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.ocm_read_audio_range(
        path.encode(), start, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(got), ctypes.byref(sr),
    )
    if rc != 0:
        raise IOError(f"ocm_read_audio_range({path}) failed rc={rc}")
    return out[: got.value].copy(), sr.value

"""ctypes bindings for the C++ runtime components (native/).

- NativeCsvWriter: buffered BBox CSV emitter with Python-repr-identical float
  formatting (native/csv_writer.cpp)
- NativeRingBuffer: fixed-slot producer/consumer frame staging buffer
  (native/ring_buffer.cpp)

The library is built on demand with `make -C native`; every consumer has a
pure-Python fallback, so the framework works without a toolchain
(``available()`` reports which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.normpath(os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcvsd_native.so")
_lib = None
_lock = threading.Lock()
_build_failed = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _try_build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        # csv writer
        lib.csvw_open.restype = ctypes.c_void_p
        lib.csvw_open.argtypes = [ctypes.c_char_p]
        lib.csvw_write_bboxes.restype = ctypes.c_int
        lib.csvw_write_bboxes.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_char_p,
        ]
        lib.csvw_flush.argtypes = [ctypes.c_void_p]
        lib.csvw_close.argtypes = [ctypes.c_void_p]
        # ring buffer
        lib.rb_create.restype = ctypes.c_void_p
        lib.rb_create.argtypes = [ctypes.c_int, ctypes.c_long]
        lib.rb_slot_ptr.restype = ctypes.POINTER(ctypes.c_char)
        lib.rb_slot_ptr.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rb_acquire_write.restype = ctypes.c_int
        lib.rb_acquire_write.argtypes = [ctypes.c_void_p]
        lib.rb_commit_write.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rb_acquire_read.restype = ctypes.c_int
        lib.rb_acquire_read.argtypes = [ctypes.c_void_p]
        lib.rb_release_read.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rb_close.argtypes = [ctypes.c_void_p]
        lib.rb_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


class NativeCsvWriter:
    """Buffered append-mode BBox CSV writer (one handle per output file)."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._h = lib.csvw_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")

    def write_video_rows(self, clip: int, name: str, frames: np.ndarray,
                         persons: np.ndarray, ltwh: np.ndarray,
                         is_anomaly: bool, anomaly: str) -> int:
        """Append n rows sharing (clip, name, is_anomaly, anomaly)."""
        frames = np.ascontiguousarray(frames, np.int32)
        persons = np.ascontiguousarray(persons, np.float64)
        ltwh = np.ascontiguousarray(ltwh, np.float64)
        n = int(frames.shape[0])
        assert persons.shape == (n,) and ltwh.shape == (n, 4)
        return self._lib.csvw_write_bboxes(
            self._h, n, int(clip), name.encode(),
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            persons.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ltwh.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            int(bool(is_anomaly)), anomaly.encode(),
        )

    def flush(self) -> None:
        self._lib.csvw_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.csvw_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeRingBuffer:
    """Fixed-slot staging buffer; slots exposed as zero-copy numpy arrays."""

    def __init__(self, slots: int, shape: tuple, dtype=np.uint8):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.slot_bytes = int(np.prod(self.shape)) * self.dtype.itemsize
        self._h = lib.rb_create(int(slots), self.slot_bytes)
        self._views = {}
        for s in range(slots):
            ptr = lib.rb_slot_ptr(self._h, s)
            buf = (ctypes.c_char * self.slot_bytes).from_address(
                ctypes.cast(ptr, ctypes.c_void_p).value
            )
            self._views[s] = np.frombuffer(buf, dtype=self.dtype).reshape(self.shape)

    def slot(self, idx: int) -> np.ndarray:
        return self._views[idx]

    def acquire_write(self) -> int:
        return self._lib.rb_acquire_write(self._h)

    def commit_write(self, idx: int) -> None:
        self._lib.rb_commit_write(self._h, idx)

    def acquire_read(self) -> int:
        return self._lib.rb_acquire_read(self._h)

    def release_read(self, idx: int) -> None:
        self._lib.rb_release_read(self._h, idx)

    def close(self) -> None:
        self._lib.rb_close(self._h)

    def destroy(self) -> None:
        if self._h:
            self._lib.rb_destroy(self._h)
            self._h = None

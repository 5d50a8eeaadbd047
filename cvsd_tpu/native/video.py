"""ctypes binding for the native multi-stream video decoder
(native/video_decode.cpp). Optional: requires the OpenCV C++ dev libs at
build time; ``video_available()`` reports whether the fast path is in.

One `MultiStreamDecoder.next_batch()` call decodes + resizes + color-converts
a whole detector batch round-robin across many videos in C++ (GIL released
for the entire call), replacing the per-frame Python loop in
pipeline/streaming.py::read_batch / pipeline/preprocess.py.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

from cvsd_tpu.native import _NATIVE_DIR, _try_build

_VIDEO_LIB_PATH = os.path.join(_NATIVE_DIR, "libcvsd_video.so")
_vlib = None
_vlock = threading.Lock()
_vfailed = False

MODE_RAW, MODE_CONTENT, MODE_CANVAS = 0, 1, 2


_ABI_VERSION = 2  # must match msd_abi_version() in native/video_decode.cpp


def load_video_lib() -> Optional[ctypes.CDLL]:
    global _vlib, _vfailed
    with _vlock:
        if _vlib is not None:
            return _vlib
        if _vfailed:
            return None
        # ALWAYS run make (a fraction of a second when up to date): an .so
        # left over from an older checkout would load fine but silently
        # drop newer trailing arguments (e.g. msd_open's stride)
        _try_build()
        if not os.path.exists(_VIDEO_LIB_PATH):
            _vfailed = True
            return None
        try:
            lib = ctypes.CDLL(_VIDEO_LIB_PATH)
        except OSError:
            _vfailed = True
            return None
        try:
            lib.msd_abi_version.restype = ctypes.c_int
            abi = int(lib.msd_abi_version())
        except AttributeError:
            abi = 1  # pre-versioning build
        if abi != _ABI_VERSION:
            import warnings

            warnings.warn(
                f"{_VIDEO_LIB_PATH}: ABI v{abi} != expected v{_ABI_VERSION} "
                "and rebuild did not refresh it; native decode disabled",
                RuntimeWarning)
            _vfailed = True
            return None
        lib.msd_open.restype = ctypes.c_void_p
        lib.msd_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.msd_next.restype = ctypes.c_int
        lib.msd_next.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.msd_active.restype = ctypes.c_int
        lib.msd_active.argtypes = [ctypes.c_void_p]
        lib.msd_close.argtypes = [ctypes.c_void_p]
        _vlib = lib
        return _vlib


def video_available() -> bool:
    return load_video_lib() is not None


class MultiStreamDecoder:
    """Round-robin multiplexed decode over a queue of videos.

    mode: MODE_RAW (source-size RGB), MODE_CONTENT (resize to (nw, nh)),
    MODE_CANVAS (resize + 114-pad to (out, out) at (px, py)). Matches the
    three upload modes of the streaming/preprocess pipelines.
    """

    def __init__(self, paths: Sequence[str], max_streams: int,
                 out_hw: Tuple[int, int], mode: int = MODE_RAW,
                 content_hw: Optional[Tuple[int, int]] = None,
                 pad_xy: Tuple[int, int] = (0, 0), frame_stride: int = 1):
        lib = load_video_lib()
        if lib is None:
            raise RuntimeError("native video decoder unavailable")
        self._lib = lib
        self.paths = [str(p) for p in paths]
        self.out_h, self.out_w = int(out_hw[0]), int(out_hw[1])
        nh, nw = content_hw if content_hw is not None else out_hw
        if mode == MODE_CONTENT and (int(nh), int(nw)) != (self.out_h, self.out_w):
            raise ValueError(
                f"CONTENT mode output buffer is (out_h, out_w)=({self.out_h}, "
                f"{self.out_w}); content_hw=({nh}, {nw}) must match it")
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._h = lib.msd_open(arr, len(self.paths), int(max_streams),
                               self.out_w, self.out_h, int(nw), int(nh),
                               int(pad_xy[0]), int(pad_xy[1]), int(mode),
                               int(frame_stride))
        if not self._h:
            raise RuntimeError("msd_open rejected the decoder geometry/stride")

    def next_batch(self, batch_size: int):
        """-> (frames (B, out_h, out_w, 3) uint8 RGB, stream_idx (B,) i32,
        frame_no (B,) i32 1-based, stamp_ms (B,) f64, k filled)."""
        B = int(batch_size)
        frames = np.empty((B, self.out_h, self.out_w, 3), np.uint8)
        sidx = np.empty(B, np.int32)
        fno = np.empty(B, np.int32)
        stamp = np.empty(B, np.float64)
        k = self._lib.msd_next(
            self._h, B,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            sidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            fno.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            stamp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return frames, sidx, fno, stamp, int(k)

    def next_batch_into(self, frames: np.ndarray):
        """Decode directly into a caller-provided (B, out_h, out_w, 3) uint8
        buffer (e.g. a native ring-buffer slot) — zero-copy variant of
        next_batch. Returns (frame_no (B,) i32, stamp_ms (B,) f64, k)."""
        assert frames.dtype == np.uint8 and frames.flags["C_CONTIGUOUS"]
        B = int(frames.shape[0])
        assert frames.shape[1:] == (self.out_h, self.out_w, 3)
        sidx = np.empty(B, np.int32)
        fno = np.zeros(B, np.int32)
        stamp = np.zeros(B, np.float64)
        k = self._lib.msd_next(
            self._h, B,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            sidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            fno.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            stamp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if k < B:
            fno[k:] = 0
            stamp[k:] = 0.0
        return fno, stamp, int(k)

    @property
    def active(self) -> int:
        return int(self._lib.msd_active(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.msd_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

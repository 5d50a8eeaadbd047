"""Host allocator hygiene for long-running serving processes.

The round-4 30-minute streaming soak measured +83 MB host RSS per pass
(linear, 1.2 -> 18.1 GB over 205 passes; artifacts/soak_streaming.json)
while Python-level allocations (tracemalloc) and device-buffer counts
(jax.live_arrays) stayed perfectly flat. The round-5 bisect
(examples/leak_bisect.py) showed glibc malloc_trim(0) collapses the growth
~13x: the memory is FREED but retained in glibc's main arena — the
streaming pipeline's per-batch churn (cv2 decode buffers, letterbox
canvases, relay serialization) interleaves long- and short-lived chunks so
the arena's high-water mark keeps ratcheting (classic fragmentation, not a
leak; the reference's per-frame cv2 loop has the same failure mode on any
long-running host, /root/reference/main.py:5-31).

malloc_trim(0) walks the arena free lists and releases whole free pages
back to the kernel (madvise/munmap). It costs ~0.1-1 ms — negligible once
per streaming pass — and is a no-op on non-glibc platforms (the symbol
simply isn't there).

Opt-out via CVSD_DISABLE_MALLOC_TRIM=1 (e.g. for allocator experiments or
diagnosis runs that want to observe raw arena behavior).
"""

from __future__ import annotations

import ctypes
import os

_trim = None
_checked = False


def malloc_trim() -> bool:
    """Release glibc arena free pages to the OS. Returns True if trimmed."""
    global _trim, _checked
    if os.environ.get("CVSD_DISABLE_MALLOC_TRIM"):
        return False
    if not _checked:
        _checked = True
        try:
            libc = ctypes.CDLL("libc.so.6", use_errno=True)
            _trim = libc.malloc_trim
            _trim.argtypes = [ctypes.c_size_t]
            _trim.restype = ctypes.c_int
        except (OSError, AttributeError):
            _trim = None
    if _trim is None:
        return False
    try:
        _trim(0)
        return True
    except Exception:
        return False


_last_trim = 0.0


def maybe_malloc_trim(min_interval_s: float = 10.0) -> bool:
    """Time-gated malloc_trim for hot paths (serving dispatch loops): trims
    at most once per `min_interval_s` so the ~0.1-1 ms cost never shows up
    in per-request latency budgets."""
    global _last_trim
    import time

    now = time.monotonic()
    if now - _last_trim < min_interval_s:
        return False
    if malloc_trim():
        _last_trim = now
        return True
    return False

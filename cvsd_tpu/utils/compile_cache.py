"""Opt-in persistent XLA compilation cache.

Every fresh process pays the full XLA compile for each program it runs —
through the axon relay that is a 15-40 s REMOTE compile per program (the
dominant cold-start cost of queue jobs, CLIs, and serving restarts; the
reference pays the analogous cost as torch/cuDNN autotune + ultralytics
model fuse on every launch, /root/reference/model.py:14-38). JAX's
persistent compilation cache serializes compiled executables keyed by HLO
hash, so a second process skips compilation entirely (verified 2.4x
cold-start on CPU; the TPU/relay A/B is tools/tpu_jobs/58_compile_cache_ab.sh).

Strictly opt-in via the CVSD_COMPILE_CACHE_DIR env var because executable
reload is backend-dependent: XLA:CPU AOT reload warns (and may SIGILL) when
the cache was written on a different host CPU generation, and remote-backend
support is what the A/B measures. When the backend refuses a cache entry,
jax falls back to a fresh compile (errors are non-fatal unless
jax_raise_persistent_cache_errors is set) — so the worst case is the status
quo plus a warning.
"""

from __future__ import annotations

import os

_ENV = "CVSD_COMPILE_CACHE_DIR"
_enabled = False


def maybe_enable_compile_cache(path: str | None = None) -> bool:
    """Enable jax's persistent compilation cache at `path` (or $CVSD_COMPILE_CACHE_DIR).

    Returns True when enabled. Call before the first jit dispatch; safe to
    call repeatedly (idempotent) and safe on jax versions without the
    feature (returns False).
    """
    global _enabled
    target = path or os.environ.get(_ENV)
    if not target:
        return False
    if _enabled:
        return True
    import jax

    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_enable_compilation_cache", True)
        # cache everything: the point is cold-start latency, and entries on
        # this machine are only ever our own programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return False
    _enabled = True
    return True

"""Opt-in persistent XLA compilation cache.

Every fresh process pays the full XLA compile for each program it runs (the
reference pays the analogous cost as torch/cuDNN autotune + ultralytics
model fuse on every launch, /root/reference/model.py:14-38). JAX's
persistent compilation cache serializes compiled executables keyed by HLO
hash, so a later process can skip compilation.

Where it helps, measured (RESULTS.md "Compile cache"):
- XLA:CPU cold start: 2.6x faster CLI time-to-first-result.
- Multi-program processes on the axon relay: whole-process total 389 s ->
  60 s warm (6.5x) because every program AFTER the first hits the cache.

Where it does NOT help, measured (artifacts/compile_cache_ab_r4.json): the
FIRST result of a relay-attached process is 0.53x — i.e. SLOWER — with a
warm cache, because the compile happens remotely on the relay regardless
and the local executable reload adds deserialization on top. Hence the
warning below on non-CPU backends.

Strictly opt-in via the CVSD_COMPILE_CACHE_DIR env var because executable
reload is backend-dependent: XLA:CPU AOT reload warns (and may SIGILL) when
the cache was written on a different host CPU generation. When the backend
refuses a cache entry, jax falls back to a fresh compile (errors are
non-fatal unless jax_raise_persistent_cache_errors is set) — so the worst
case is the status quo plus a warning.
"""

from __future__ import annotations

import os

_ENV = "CVSD_COMPILE_CACHE_DIR"
_enabled = False
_enabled_path: str | None = None


def maybe_enable_compile_cache(path: str | None = None) -> bool:
    """Enable jax's persistent compilation cache at `path` (or $CVSD_COMPILE_CACHE_DIR).

    Returns True when enabled. Call before the first jit dispatch; safe to
    call repeatedly (idempotent) and safe on jax versions without the
    feature (returns False).
    """
    global _enabled, _enabled_path
    target = path or os.environ.get(_ENV)
    if not target:
        return False
    if _enabled:
        if path and path != _enabled_path:
            import warnings

            warnings.warn(
                f"compile cache already enabled at {_enabled_path!r}; "
                f"ignoring new path {path!r}", stacklevel=2)
        return True
    import jax

    # check every knob exists BEFORE mutating any, so a missing one on an
    # older jax can't leave the cache half-configured
    knobs = (("jax_compilation_cache_dir", target),
             ("jax_enable_compilation_cache", True),
             # cache everything: the point is cold-start latency, and entries
             # on this machine are only ever our own programs
             ("jax_persistent_cache_min_compile_time_secs", 0.0),
             ("jax_persistent_cache_min_entry_size_bytes", -1))
    if not all(hasattr(jax.config, k) for k, _ in knobs):
        return False
    try:
        os.makedirs(target, exist_ok=True)
        for k, v in knobs:
            jax.config.update(k, v)
    except Exception:
        return False
    # Resolve the backend WITHOUT initializing it: jax.default_backend()
    # creates the device client, and on a wedged axon relay that first
    # contact can hang for minutes — unacceptable inside an opt-in helper
    # that CLIs call at startup. The config/env string is enough to decide
    # whether the non-CPU warning applies.
    backend = (getattr(jax.config, "jax_platforms", None)
               or os.environ.get("JAX_PLATFORMS") or "")
    backend = backend.split(",")[0].strip().lower() or "default-device"
    if backend not in ("cpu",):
        import warnings

        warnings.warn(
            f"persistent compile cache enabled on backend {backend!r}: on a "
            "relay-attached device the FIRST program's time-to-result is "
            "measured SLOWER with a warm cache (0.53x, "
            "artifacts/compile_cache_ab_r4.json); the cache pays off only "
            "for programs after the first in the same process", stacklevel=2)
    _enabled = True
    _enabled_path = target
    return True

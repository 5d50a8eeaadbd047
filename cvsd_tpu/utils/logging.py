"""Observability: scalar logging (JSONL always, TensorBoard when available) and
step timers / jax.profiler trace hooks.

The reference logs via tqdm + TensorBoard scalars (shopformer_2/train.py:188-190,
357-361, add_hparams :564-579) and JSON artifacts. Here a single ScalarLogger
fans out to both sinks, and Profiler wraps jax.profiler for device traces
(SURVEY.md §5.1: the reference has no tracing — this is a new core subsystem).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax


class ScalarLogger:
    """Logs scalars to <dir>/scalars.jsonl and (optionally) TensorBoard."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # lazy, optional

                self._tb = SummaryWriter(os.path.join(log_dir, "runs"))
            except Exception:
                self._tb = None

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step), "t": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def log_dict(self, scalars: Dict[str, float], step: int, prefix: str = "") -> None:
        for k, v in scalars.items():
            if isinstance(v, (int, float)):
                self.log_scalar(f"{prefix}{k}", v, step)

    def log_hparams(self, hparams: Dict[str, Any], metrics: Dict[str, float]) -> None:
        """Final hparams/metrics record (reference: shopformer_2/train.py:564-579)."""
        with open(os.path.join(self.log_dir, "hparams.json"), "w") as f:
            json.dump({"hparams": hparams, "metrics": metrics}, f, indent=2, default=str)
        if self._tb is not None:
            flat = {k: v for k, v in hparams.items() if isinstance(v, (int, float, str, bool))}
            try:
                self._tb.add_hparams(flat, {f"final/{k}": v for k, v in metrics.items()})
            except Exception:
                pass

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock step timer with jax block_until_ready semantics."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result: Any = None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

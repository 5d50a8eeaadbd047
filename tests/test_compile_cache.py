"""Persistent XLA compile cache (cvsd_tpu/utils/compile_cache.py).

The reference pays its analogous cold-start cost (torch/cuDNN autotune +
ultralytics model fuse, /root/reference/model.py:14-38) on every launch;
here a second process can reload the serialized executable instead. These
tests pin the opt-in contract and the write/read round trip on CPU; the
relay-side cold-start A/B is tools/tpu_jobs/58_compile_cache_ab.sh.
"""

import json
import os
import subprocess
import sys

from cvsd_tpu.utils import compile_cache as cc

_CHILD = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["CVSD_REPO"])
from cvsd_tpu.utils.compile_cache import maybe_enable_compile_cache
assert maybe_enable_compile_cache() is True
import jax.numpy as jnp
f = jax.jit(lambda x: (x @ x.T).sum())
out = float(f(jnp.arange(64.0).reshape(8, 8)))
print(json.dumps({"out": out}))
"""


def _run_child(cache_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["CVSD_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["CVSD_COMPILE_CACHE_DIR"] = str(cache_dir)
    r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])


def test_noop_without_env(monkeypatch):
    monkeypatch.delenv(cc._ENV, raising=False)
    monkeypatch.setattr(cc, "_enabled", False)
    assert cc.maybe_enable_compile_cache() is False


def test_write_then_hit_across_processes(tmp_path):
    cache = tmp_path / "xla_cache"
    first = _run_child(cache)
    entries = os.listdir(cache)
    assert entries, "first process wrote no cache entries"
    # fresh process reading the same cache: identical numerics, no new entries
    second = _run_child(cache)
    assert second["out"] == first["out"]
    assert sorted(os.listdir(cache)) == sorted(entries), (
        "cache-hit process recompiled (wrote new entries) instead of reading")

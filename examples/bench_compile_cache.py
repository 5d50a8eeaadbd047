"""Persistent-compile-cache cold-start A/B on the real backend.

Measures time-to-first-detection-result of the v5m-scale fused
letterbox->detect->NMS program (the framework's biggest compile) in three
FRESH processes:

1. no cache           — the status-quo cold start (full remote compile)
2. cold cache (write) — same compile + serialize/write overhead
3. warm cache (read)  — fresh process reading the entry written by (2)

If (3) is materially faster than (1) on the axon relay, every queue job /
CLI / serving restart gets that saving (utils/compile_cache.py); if the
backend refuses serialized executables, (3) ~= (1) and the JSON records
that the cache is a no-op here.

Run: python examples/bench_compile_cache.py [--img 320] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

_CHILD = r"""
import os, sys, time
t_proc = time.time()
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, os.environ["CVSD_REPO"])
from cvsd_tpu.utils.compile_cache import maybe_enable_compile_cache
maybe_enable_compile_cache()  # reads CVSD_COMPILE_CACHE_DIR if set
import numpy as np
from cvsd_tpu.config import get_default_config
from cvsd_tpu.pipeline.preprocess import DetectionPipeline

cfg = get_default_config()
cfg["detector"].update(img_size=int(os.environ["AB_IMG"]),
                       batch_size=int(os.environ["AB_BATCH"]),
                       native_decode=False)
pipe = DetectionPipeline(cfg)
frames = np.zeros((int(os.environ["AB_BATCH"]), 240, 320, 3), np.uint8)
t0 = time.time()
out = pipe.detect_frames(frames)
# force a device->host sync through a scalar (relay-safe, see bench.py)
_ = float(np.asarray(out[2]).sum())
print(json.dumps({"first_result_s": round(time.time() - t0, 2),
                  "proc_total_s": round(time.time() - t_proc, 2)}))
""".replace("json.dumps", "__import__('json').dumps")


def _run(env_extra):
    env = dict(os.environ)
    # the no_cache baseline must not inherit an ambient cache dir (README
    # suggests exporting it globally) — only the explicit arms enable it
    env.pop("CVSD_COMPILE_CACHE_DIR", None)
    env["CVSD_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.update(env_extra)
    r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=1800)
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"child failed rc={r.returncode}:\n{r.stderr[-2000:]}")
    return json.loads(line[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=320)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cache_dir = tempfile.mkdtemp(prefix="cvsd_xla_cache_")
    try:
        base = {"AB_IMG": str(args.img), "AB_BATCH": str(args.batch)}
        res = {}
        res["no_cache"] = _run(base)
        print(f"no cache: first result {res['no_cache']['first_result_s']}s",
              flush=True)
        res["cache_write"] = _run({**base, "CVSD_COMPILE_CACHE_DIR": cache_dir})
        n_entries = len(os.listdir(cache_dir))
        print(f"cold cache (write): {res['cache_write']['first_result_s']}s, "
              f"{n_entries} entries", flush=True)
        res["cache_hit"] = _run({**base, "CVSD_COMPILE_CACHE_DIR": cache_dir})
        print(f"warm cache (read): {res['cache_hit']['first_result_s']}s",
              flush=True)
        res["cache_entries"] = n_entries
        res["speedup_cold_start"] = round(
            res["no_cache"]["first_result_s"]
            / max(res["cache_hit"]["first_result_s"], 1e-9), 2)
        print(json.dumps(res))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(res, f, indent=2)
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

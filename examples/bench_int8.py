"""Benchmark: int8 PTQ detector vs bf16 on one chip.

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 peak and int8 activations
halve per-conv HBM bytes — and PROFILE.md pins the detector forward as
HBM-bound (49 ms/batch vs a 26.4 ms bandwidth floor at B=64/640), so int8
attacks the measured bottleneck directly. This bench quantizes the default
v5m-scale detector (models/detector_int8.py), then times the SAME fused
letterbox->detect->NMS program for the float and quantized models at the
bench.py operating points (640 canvas + auto-canvas 320, B=128).

Timing follows bench.py's relay-safe recipe: device-side reduction chained
over every output, ONE scalar fetch at the end.

Run (real TPU, chip must be otherwise idle):
    python examples/bench_int8.py            # full: 640 + auto canvas
    BENCH_BATCH=64 python examples/bench_int8.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-registers a TPU
    # backend (the env var alone does not win -- CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.models.detector_int8 import quantize_detector
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline

    backend = jax.default_backend()
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    src_h, src_w = 240, 320

    cfg = get_default_config()
    if backend != "tpu":
        cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                               dtype="float32")
        batch, iters = min(batch, 4), min(iters, 3)

    float_pipe = DetectionPipeline(cfg)
    rng = np.random.default_rng(0)

    # PTQ with synthetic calibration at the 640 canvas (range-setting only;
    # accuracy parity is unit-tested in tests/test_detector_int8.py)
    size = float_pipe.model.img_size
    calib = [rng.uniform(0, 1, (8, size, size, 3)).astype(np.float32)
             for _ in range(4)]
    t0 = time.perf_counter()
    qmodel, qvars = quantize_detector(float_pipe.model, float_pipe.variables, calib)
    quant_s = time.perf_counter() - t0

    qcfg = json.loads(json.dumps(cfg))
    qcfg["detector"]["quantized"] = True
    quant_pipe = DetectionPipeline(qcfg, variables=qvars)

    buffers = [jnp.asarray(rng.integers(0, 255, (batch, src_h, src_w, 3)).astype(np.uint8))
               for _ in range(min(4, iters))]
    frames = [buffers[i % len(buffers)] for i in range(iters)]
    reduce_ = jax.jit(lambda outs: sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
    for f in buffers:
        float(jnp.sum(f.astype(jnp.float32)))

    def timed(pipe, full):
        float(reduce_(full(pipe.variables, frames[0])))  # compile
        best = float("inf")
        for _trial in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for f in frames:
                acc = acc + reduce_(full(pipe.variables, f))
            float(acc)
            best = min(best, time.perf_counter() - t0)
        return batch * iters / best, 1000 * best / iters

    results = {}
    for mode, auto in (("canvas640", False), ("auto320", True)):
        if auto and backend != "tpu":
            continue
        for name, base_cfg, variables in (("bf16", cfg, float_pipe.variables),
                                          ("int8", qcfg, qvars)):
            c = json.loads(json.dumps(base_cfg))
            c["detector"]["auto_size"] = auto
            pipe = DetectionPipeline(c, variables=variables)
            fps, ms = timed(pipe, pipe._full_fn(src_h, src_w))
            results[f"{mode}_{name}"] = {"fps": round(fps, 1),
                                         "ms_per_batch": round(ms, 2)}
            print(f"{mode:10s} {name}: {fps:8.1f} fps  {ms:7.2f} ms/batch",
                  flush=True)

    for mode in ("canvas640", "auto320"):
        if f"{mode}_int8" in results:
            sp = results[f"{mode}_int8"]["fps"] / results[f"{mode}_bf16"]["fps"]
            results[f"{mode}_speedup"] = round(sp, 3)
    results["quantize_seconds"] = round(quant_s, 1)
    results["batch"] = batch
    results["backend"] = backend
    print(json.dumps(results))


if __name__ == "__main__":
    main()

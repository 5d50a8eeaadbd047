"""Detector scale-point bench: v5m channels vs lane-aligned (128-multiple)
channels — proves or refutes PROFILE.md's lane-padding hypothesis.

PROFILE.md attributes the 49 ms vs 26 ms bandwidth-floor gap at the v5m point
(B=64/640) to sub-128 channel counts (48 @ 320^2, 96 @ 160^2) padding the
TPU (8,128) tile lane dim (up to 2.7x HBM amplification) plus CSP concat
re-reads. The v5m counts exist only for ultralytics weight import; from-
scratch configs are free to round channels to 128 (detector.channel_divisor).

For each scale point this measures steady-state fwd ms/batch and fps with
the bench.py timing pattern (device-resident input, chained device-side
reduction, ONE final scalar fetch — block_until_ready is unreliable through
the relay) and reports XLA's FLOP / HBM-bytes cost analysis per batch.

Run (real TPU): python examples/bench_detector_scale.py [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

POINTS = [
    # name, width_mult, channel_divisor
    ("v5m (0.75/div8: 48-96-192-384-768)", 0.75, 8),
    ("lane128 (0.75/div128: 128-128-256-384-768)", 0.75, 128),
    ("half (0.375/div8: 24-48-96-192-384)", 0.375, 8),
    ("half-lane128 (0.375/div128: 128-..-384)", 0.375, 128),
]


# v5e roofline constants for context columns (per chip)
BF16_PEAK_TFLOPS = 197.0
HBM_PEAK_GBPS = 819.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--depth-mult", type=float, default=0.67)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--raw-forward", action="store_true",
                    help="also time the bare conv forward (no letterbox/"
                         "decode/NMS) per point — isolates postprocess "
                         "overhead from the conv stack")
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument("--points", default=None,
                    help="override the scale points as comma-separated "
                         "width:divisor pairs, e.g. '0.25:8,0.375:8' (the "
                         "production streaming width is 0.25 — PROFILE.md's "
                         "batch-dependent Bc lever needs it measured)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline

    backend = jax.default_backend()
    batch, iters = args.batch, args.iters
    if backend != "tpu":
        batch, iters = min(batch, 2), min(iters, 2)
    src_h, src_w = 240, 320
    print(f"backend={backend} batch={batch} img={args.img}")

    rng = np.random.default_rng(0)
    buffers = [jnp.asarray(rng.integers(0, 255, (batch, src_h, src_w, 3)).astype(np.uint8))
               for _ in range(min(4, iters))]
    frames = [buffers[i % len(buffers)] for i in range(iters)]
    for f in buffers:
        float(jnp.sum(f.astype(jnp.float32)))

    reduce_ = jax.jit(lambda outs: sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
    points = POINTS
    if args.points:
        points = []
        for spec in args.points.split(","):
            w, _, d = spec.partition(":")
            wm, div = float(w), int(d or 8)
            points.append((f"custom ({wm}/div{div})", wm, div))
    results = []
    for name, wm, div in points:
        cfg = get_default_config()
        cfg["detector"].update(img_size=args.img, width_mult=wm, channel_divisor=div,
                               depth_mult=args.depth_mult,
                               dtype="bfloat16" if backend == "tpu" else "float32")
        pipe = DetectionPipeline(cfg)
        full = pipe._full_fn(src_h, src_w)

        # XLA cost analysis: FLOPs + HBM bytes for the whole fused program
        flops = hbm = None
        try:
            lowered = jax.jit(full).lower(pipe.variables, frames[0])
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            hbm = float(cost.get("bytes accessed", 0.0))
        except Exception as e:  # noqa: BLE001
            print(f"  cost analysis unavailable: {e}")

        t0 = time.perf_counter()
        float(reduce_(full(pipe.variables, frames[0])))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for f in frames:
                acc = acc + reduce_(full(pipe.variables, f))
            float(acc)
            best = min(best, time.perf_counter() - t0)
        ms = 1000 * best / iters
        fps = batch * iters / best
        row = {"point": name, "width_mult": wm, "channel_divisor": div,
               "ms_per_batch": round(ms, 2), "fps": round(fps, 1),
               "compile_s": round(compile_s, 1),
               "tflop_per_batch": round(flops / 1e12, 3) if flops else None,
               "hbm_gb_per_batch": round(hbm / 1e9, 2) if hbm else None,
               "eff_tflops": round(flops / 1e12 / (best / iters), 1) if flops else None,
               "hbm_gbps": round(hbm / 1e9 / (best / iters), 0) if hbm else None}
        if flops and hbm:
            # roofline context: arithmetic intensity vs the v5e ridge point
            # (~peak_flops/peak_bw = 240 flop/byte) says whether a point CAN
            # be compute-bound; pct_* say which resource it actually uses
            row["intensity_flop_per_byte"] = round(flops / hbm, 1)
            row["pct_bf16_peak"] = round(100 * row["eff_tflops"] / BF16_PEAK_TFLOPS, 1)
            row["pct_hbm_peak"] = round(100 * row["hbm_gbps"] / HBM_PEAK_GBPS, 1)
        if args.raw_forward:
            # bare conv forward on a device-resident pre-letterboxed canvas:
            # the (full - raw) gap is letterbox + decode + NMS + uint8 upload
            # handling, a fixed cost that weighs more at smaller widths
            import jax as _jax

            canvas = jnp.asarray(
                rng.random((batch, args.img, args.img, 3), np.float32),
                dtype=jnp.bfloat16 if backend == "tpu" else jnp.float32)
            raw_fn = _jax.jit(lambda v, x: pipe.model.apply(v, x, train=False))
            raw_reduce = _jax.jit(lambda outs: sum(
                jnp.sum(o.astype(jnp.float32))
                for o in _jax.tree_util.tree_leaves(outs)))
            rflops = rbytes = None
            try:
                cost = raw_fn.lower(pipe.variables, canvas).compile().cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                rflops = float(cost.get("flops", 0.0))
                rbytes = float(cost.get("bytes accessed", 0.0))
            except Exception:  # noqa: BLE001
                pass
            float(raw_reduce(raw_fn(pipe.variables, canvas)))  # compile
            rbest = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                acc = jnp.float32(0)
                for _i in range(iters):
                    acc = acc + raw_reduce(raw_fn(pipe.variables, canvas))
                float(acc)
                rbest = min(rbest, time.perf_counter() - t0)
            row["raw_ms_per_batch"] = round(1000 * rbest / iters, 2)
            if rflops:
                row["raw_eff_tflops"] = round(rflops / 1e12 / (rbest / iters), 1)
                row["raw_pct_bf16_peak"] = round(
                    100 * row["raw_eff_tflops"] / BF16_PEAK_TFLOPS, 1)
            if rbytes:
                row["raw_hbm_gbps"] = round(rbytes / 1e9 / (rbest / iters), 0)
        results.append(row)
        print(json.dumps(row))
    print(json.dumps({"results": results}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"img": args.img, "batch": batch, "results": results}, f,
                      indent=2)


if __name__ == "__main__":
    main()

"""Bisect the streaming-soak host RSS leak (round-4 soak: +83 MB/pass).

Runs a few passes of stream_videos_concurrent and records, per pass:
  - VmRSS from /proc/self/status (the soak's leaking metric)
  - tracemalloc current bytes (Python-owned allocations only)
  - len(jax.live_arrays()) (device/client-owned buffers)
  - gc object count
plus a tracemalloc top-10 diff between the first steady pass and the last.

Interpretation: RSS slope with flat tracemalloc and flat live_arrays points
at C/C++ allocations (native decoder, cv2, or the backend client); a
matching tracemalloc slope names the Python line; a live_arrays slope names
leaked device buffers.

Usage: JAX_PLATFORMS=cpu python examples/leak_bisect.py --passes 6 \
          [--native-decode off] [--max-streams 8] [--videos 8]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-streams", type=int, default=8)
    ap.add_argument("--native-decode", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--malloc-trim", action="store_true",
                    help="call glibc malloc_trim(0) before each RSS read: if "
                         "RSS flattens, the growth is free-but-unreturned "
                         "arena memory (fragmentation), not a live leak")
    ap.add_argument("--host-letterbox", default="content")
    ap.add_argument("--out", default="/tmp/leak_bisect")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.data.render import render_pose_video
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.shopformer import build_shopformer
    from cvsd_tpu.pipeline.streaming import StreamingPipeline

    print(f"backend={jax.default_backend()} native={args.native_decode}", flush=True)
    ds = SyntheticPoseLiftDataset(args.videos, seq_len=args.frames,
                                  anomaly_ratio=0.5, seed=5)
    paths = []
    for i in range(args.videos):
        p = os.path.join(args.out, f"v{i}.mp4")
        if not os.path.exists(p):
            render_pose_video(p, ds.poses[i], seed=100 + i)
        paths.append(p)

    cfg = get_default_config()
    cfg["detector"].update(img_size=args.img, width_mult=0.25, depth_mult=0.34,
                           batch_size=args.batch, conf_threshold=0.3,
                           max_detections=4, dtype="float32", pose_head=True,
                           host_letterbox=args.host_letterbox)
    if args.native_decode != "auto":
        cfg["detector"]["native_decode"] = args.native_decode == "on"
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)
    pipe = StreamingPipeline(cfg, scorer=scorer)

    tracemalloc.start(10)
    series = []
    snap_base = None
    trim = None
    if args.malloc_trim:
        import ctypes

        trim = ctypes.CDLL("libc.so.6").malloc_trim
    for p in range(args.passes):
        res = pipe.stream_videos_concurrent(paths, max_streams=args.max_streams)
        gc.collect()
        if trim is not None:
            trim(0)
        cur, _peak = tracemalloc.get_traced_memory()
        row = {"pass": p, "rss_mb": round(rss_mb(), 1),
               "tracemalloc_mb": round(cur / 1e6, 2),
               "live_arrays": len(jax.live_arrays()),
               "gc_objects": len(gc.get_objects()),
               "events": len(res["events"])}
        series.append(row)
        print(json.dumps(row), flush=True)
        if p == 1:
            snap_base = tracemalloc.take_snapshot()
    if snap_base is not None and args.passes > 2:
        top = tracemalloc.take_snapshot().compare_to(snap_base, "lineno")[:10]
        print("tracemalloc top-10 growth since pass 1:")
        for s in top:
            print("  ", s, flush=True)
    if len(series) > 2:
        d_rss = (series[-1]["rss_mb"] - series[1]["rss_mb"]) / (len(series) - 2)
        d_tm = (series[-1]["tracemalloc_mb"] - series[1]["tracemalloc_mb"]) / (len(series) - 2)
        d_la = (series[-1]["live_arrays"] - series[1]["live_arrays"]) / (len(series) - 2)
        print(json.dumps({"rss_mb_per_pass": round(d_rss, 2),
                          "tracemalloc_mb_per_pass": round(d_tm, 2),
                          "live_arrays_per_pass": round(d_la, 2),
                          "native": args.native_decode}))


if __name__ == "__main__":
    main()

"""Streaming-pipeline soak test: sustained serving stability over many passes.

Production serving is a long-running process; this drives the full live path
(pipeline/streaming.py::stream_videos_concurrent) repeatedly for --minutes
wall-clock and records, per pass:

  - throughput (fps, videos/hour) — catches steady-state drift/regression
  - host RSS — catches leaks in the decode ring / prefetch / in-flight queues
  - event count + score checksum vs the first steady pass — catches
    nondeterminism or state bleed between passes (tracker/window state must
    reset per video)

Writes a JSON time series + verdict. The reference's serving story is a
per-frame loop (/root/reference/main.py:5-31) with no stability harness.

Run (real TPU): python examples/soak_streaming.py --minutes 30
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--videos", type=int, default=32)
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-streams", type=int, default=8)
    ap.add_argument("--stream-depth", type=int, default=3)
    ap.add_argument("--host-letterbox", default="content")
    ap.add_argument("--out", default="/tmp/soak_streaming")
    ap.add_argument("--artifact", default="/tmp/soak_streaming.json")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-registers a TPU
    # backend (the env var alone does not win — CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.data.render import render_pose_video
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.shopformer import build_shopformer
    from cvsd_tpu.pipeline.streaming import StreamingPipeline

    print(f"backend={jax.default_backend()}", flush=True)
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
                           stream_depth=args.stream_depth,
                           host_letterbox=args.host_letterbox)
    model = build_shopformer(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    scorer = ShopformerScorer(model, variables, cfg)
    pipe = StreamingPipeline(cfg, scorer)

    def checksum(events):
        # order-insensitive: sorted rounded scores
        return [round(float(e.score), 5) for e in
                sorted(events, key=lambda e: (e.video, e.track_id, e.frame_end))]

    series = []
    ref_sum = None
    deadline = time.time() + args.minutes * 60
    i = 0
    while time.time() < deadline or i < 3:  # at least warmup + 2 passes
        t0 = time.time()
        out = pipe.stream_videos_concurrent(paths, max_streams=args.max_streams)
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        row = {"pass": i, "fps": round(out["fps"], 1),
               "videos_per_hour": round(out["videos_per_hour"], 0),
               "events": len(out["events"]), "rss_mb": round(rss_mb, 1),
               "wall_s": round(time.time() - t0, 1)}
        cs = checksum(out["events"])
        if i == 1:
            ref_sum = cs
        elif i > 1:
            row["events_match_pass1"] = bool(cs == ref_sum)
        series.append(row)
        print(json.dumps(row), flush=True)
        i += 1

    steady = series[1:]
    fps = [r["fps"] for r in steady]
    rss = [r["rss_mb"] for r in steady]
    verdict = {
        "passes": len(series),
        "fps_first_steady": fps[0], "fps_last": fps[-1],
        "fps_drift_pct": round(100 * (fps[-1] - fps[0]) / fps[0], 2),
        "fps_min": min(fps), "fps_max": max(fps),
        "rss_first_steady_mb": rss[0], "rss_last_mb": rss[-1],
        "rss_growth_mb": round(rss[-1] - rss[0], 1),
        "all_event_sets_match": all(r.get("events_match_pass1", True)
                                    for r in steady),
    }
    print(json.dumps(verdict), flush=True)
    with open(args.artifact, "w") as f:
        json.dump({"series": series, "verdict": verdict,
                   "config": {"videos": args.videos, "frames": args.frames,
                              "img": args.img, "batch": args.batch,
                              "max_streams": args.max_streams}}, f, indent=2)


if __name__ == "__main__":
    main()

"""Streaming-pipeline throughput benchmark with per-stage breakdown.

Measures the live decode -> detect -> track -> window -> score path
(pipeline/streaming.py::stream_videos_concurrent) on rendered videos and
prints aggregate fps, videos/hour and the read/detect/track/score stage
seconds — the numbers that tell you whether the chip or the host loop is
the bottleneck (SURVEY §6: end-to-end videos/hour).

Weights are random-init: throughput depends on shapes and detection counts,
not on weight values; conf_threshold keeps per-frame detections realistic.

Run: python examples/bench_streaming.py [--videos 32] [--img 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=32)
    ap.add_argument("--frames", type=int, default=72, help="frames per video")
    ap.add_argument("--img", type=int, default=128, help="detector canvas")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-streams", type=int, default=8)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--stream-depth", type=int, default=3,
                    help="detection batches kept in flight")
    ap.add_argument("--host-letterbox", nargs="?", const=True, default=False,
                    choices=[True, False, "content"],
                    help="resize to canvas on host; upload canvas-size uint8 "
                         "(4.7x fewer bytes through the relay at 240p->128)")
    ap.add_argument("--score-batch", type=int, default=32)
    ap.add_argument("--native-decode", choices=["auto", "on", "off"],
                    default="auto", help="C++ batched decoder (native/video_decode.cpp)")
    ap.add_argument("--frame-stride", type=int, default=1,
                    help="detect every Nth source frame (tracker bridges gaps)")
    ap.add_argument("--out", default="/tmp/bench_streaming")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-registers a TPU
    # backend (the env var alone does not win -- CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.data.render import render_pose_video
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.shopformer import build_shopformer
    from cvsd_tpu.pipeline.streaming import StreamingPipeline

    print(f"backend={jax.default_backend()}")
    ds = SyntheticPoseLiftDataset(args.videos, seq_len=args.frames, anomaly_ratio=0.5, seed=5)
    paths = []
    for i in range(args.videos):
        p = os.path.join(args.out, f"v{i}.mp4")
        if not os.path.exists(p):
            render_pose_video(p, ds.poses[i], seed=100 + i)
        paths.append(p)

    cfg = get_default_config()
    cfg["detector"].update(img_size=args.img, width_mult=0.25, depth_mult=0.34,
                           batch_size=args.batch, conf_threshold=0.3, max_detections=4,
                           dtype="float32", pose_head=True, tta_flip=args.tta,
                           stream_depth=args.stream_depth,
                           host_letterbox=args.host_letterbox,
                           frame_stride=args.frame_stride)
    if args.native_decode != "auto":
        cfg["detector"]["native_decode"] = args.native_decode == "on"
    cfg["data"]["batch_size"] = args.score_batch
    model = build_shopformer(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    scorer = ShopformerScorer(model, variables, cfg)
    pipe = StreamingPipeline(cfg, scorer)

    # warm pass compiles everything; second pass is the measurement
    for label in ("warmup", "steady"):
        out = pipe.stream_videos_concurrent(paths, max_streams=args.max_streams)
        print(f"{label}: {out['frames']} frames {out['fps']:.1f} fps "
              f"{out['videos_per_hour']:.0f} videos/h "
              f"stages={json.dumps({k: round(v, 2) for k, v in out['stage_seconds'].items()})} "
              f"events={len(out['events'])}", flush=True)


if __name__ == "__main__":
    main()

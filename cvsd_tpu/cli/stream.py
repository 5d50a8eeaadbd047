"""Streaming end-to-end inference over videos: decode -> detect(+pose) ->
track -> Shopformer anomaly scores.

The working replacement for the reference's broken real-time driver
(/root/reference/main.py).

    python -m cvsd_tpu.cli.stream --checkpoint ckpt/stage2_best.msgpack \
        --videos a.mp4 b.mp4 --concurrent --output events.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json

from cvsd_tpu.cli.common import add_config_args


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--checkpoint", type=str, required=True, help="Shopformer checkpoint")
    p.add_argument("--detector_checkpoint", type=str, default=None)
    p.add_argument("--videos", nargs="+", required=True)
    p.add_argument("--concurrent", action="store_true",
                   help="multiplex videos into shared detector batches")
    p.add_argument("--max_streams", type=int, default=8)
    p.add_argument("--threshold", type=float, default=None, help="flag events >= threshold")
    p.add_argument("--annotations", type=str, default=None,
                   help="temporal GT file (Temporal_Anomaly_Annotation_for_"
                        "Testing_Videos.txt format): joins live scores against "
                        "labels and prints video/event AUC with bootstrap CI")
    p.add_argument("--aggregation", type=str, default="max",
                   choices=["max", "mean", "percentile_95"])
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--events_jsonl", type=str, default=None,
                   help="write each scored window as a JSON line AS IT IS "
                        "SCORED (live sink; requires --concurrent)")
    p.add_argument("--no_mesh", action="store_true",
                   help="single-device even when multiple chips are visible "
                        "(default: shard frame batches over the data mesh axis)")
    args = p.parse_args(argv)
    if args.events_jsonl and not args.concurrent:
        p.error("--events_jsonl requires --concurrent")

    from cvsd_tpu.eval.evaluate import load_model
    from cvsd_tpu.pipeline.streaming import StreamingPipeline

    scorer = load_model(args.checkpoint)

    # checkpoint-embedded config + CLI dotted overrides (--set a.b=c), so
    # detector options (pose_mode, stream_depth, tta_flip, ...) are reachable
    from cvsd_tpu.config.config import apply_overrides

    cfg = apply_overrides(scorer.config, getattr(args, "overrides", []) or [])
    detector_variables = None
    if args.detector_checkpoint:
        # merge the detector checkpoint's embedded architecture config
        # (head_variant/width/reg_max/...) so imported yolov5u checkpoints
        # rebuild + decode correctly; explicit --set detector.* still wins
        from cvsd_tpu.cli.common import load_detector_cli

        detector_variables, cfg = load_detector_cli(
            args.detector_checkpoint, cfg, getattr(args, "overrides", []) or [])
    scorer.config = cfg
    # multi-chip streaming: shard multiplexed frame batches over the mesh's
    # data axis when >1 device is visible (disable with --no_mesh)
    mesh_config = None
    if not args.no_mesh:
        from cvsd_tpu.cli.common import maybe_mesh

        mesh_config = maybe_mesh(cfg)
    pipe = StreamingPipeline(cfg, scorer, detector_variables=detector_variables,
                             mesh_config=mesh_config)
    if args.concurrent:
        sink = open(args.events_jsonl, "w") if args.events_jsonl else None
        try:
            on_event = None
            if sink is not None:
                def on_event(e):
                    sink.write(json.dumps(dataclasses.asdict(e)) + "\n")
                    sink.flush()
            out = pipe.stream_videos_concurrent(args.videos,
                                                max_streams=args.max_streams,
                                                on_event=on_event)
        finally:
            if sink is not None:
                sink.close()
    else:
        out = pipe.stream_videos(args.videos)

    events = [dataclasses.asdict(e) for e in out["events"]]
    if args.threshold is not None:
        for e in events:
            e["anomalous"] = e["score"] >= args.threshold
    result = {k: v for k, v in out.items() if k != "events"}
    result["events"] = events
    print(f"{out['videos']} videos, {out['frames']} frames, "
          f"{out['fps']:.1f} fps, {out['videos_per_hour']:.1f} videos/hour, "
          f"{len(events)} scored windows")
    if args.annotations:
        from cvsd_tpu.data.ucf_crime import read_temporal_annotations
        from cvsd_tpu.eval.streaming_eval import evaluate_streaming

        res = evaluate_streaming(out["events"], read_temporal_annotations(args.annotations),
                                 aggregation=args.aggregation,
                                 include_eventless_videos=args.videos)
        print(f"video AUC ({args.aggregation}): {res.video_auc:.4f} "
              f"[95% CI {res.video_auc_ci[0]:.4f}, {res.video_auc_ci[1]:.4f}] "
              f"over {res.n_videos} videos; event AUC: {res.event_auc:.4f} "
              f"({res.n_events} windows)")
        if res.unmatched_videos:
            print(f"  unmatched (no GT): {res.unmatched_videos}")
        result["streaming_eval"] = res.as_dict()
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2, default=float)


if __name__ == "__main__":
    main()

"""Write annotated videos: boxes, track IDs, skeletons, anomaly scores.

The visual-output counterpart of cli.stream (ultralytics `save=True`
equivalent; the reference's main.py intended a live visual driver).

    python -m cvsd_tpu.cli.annotate --checkpoint ckpt/stage2_best.msgpack \
        --videos a.mp4 b.mp4 --out-dir annotated/
"""

from __future__ import annotations

import argparse
import json
import os

from cvsd_tpu.cli.common import add_config_args


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Shopformer checkpoint (omit for detector-only "
                        "annotation: boxes + track IDs, no anomaly scores)")
    p.add_argument("--detector_checkpoint", type=str, default=None)
    p.add_argument("--videos", nargs="+", required=True)
    p.add_argument("--out-dir", type=str, default="annotated")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="anomaly threshold for the red/green box coloring")
    p.add_argument("--fourcc", type=str, default="mp4v")
    p.add_argument("--output", type=str, default=None, help="summary JSON path")
    args = p.parse_args(argv)

    from cvsd_tpu.config.config import apply_overrides
    from cvsd_tpu.viz.annotate import annotate_video, annotate_video_detections

    if not args.checkpoint and not args.detector_checkpoint:
        p.error("one of --checkpoint / --detector_checkpoint is required")

    detector_variables = None
    if args.checkpoint:
        from cvsd_tpu.eval.evaluate import load_model
        from cvsd_tpu.pipeline.streaming import StreamingPipeline

        scorer = load_model(args.checkpoint)
        cfg = apply_overrides(scorer.config, getattr(args, "overrides", []) or [])
        if args.detector_checkpoint:
            from cvsd_tpu.cli.common import load_detector_cli

            detector_variables, cfg = load_detector_cli(
                args.detector_checkpoint, cfg, getattr(args, "overrides", []) or [])
        scorer.config = cfg
        pipe = StreamingPipeline(cfg, scorer, detector_variables=detector_variables)
        run = lambda v, out: annotate_video(pipe, v, out,  # noqa: E731
                                            threshold=args.threshold,
                                            fourcc=args.fourcc)
    else:
        # detector-only mode
        from cvsd_tpu.cli.common import load_detector_cli, resolve_config
        from cvsd_tpu.pipeline.preprocess import DetectionPipeline

        cfg = resolve_config(args)
        detector_variables, cfg = load_detector_cli(
            args.detector_checkpoint, cfg, getattr(args, "overrides", []) or [])
        detection = DetectionPipeline(cfg, variables=detector_variables)
        run = lambda v, out: annotate_video_detections(  # noqa: E731
            detection, v, out, fourcc=args.fourcc)

    os.makedirs(args.out_dir, exist_ok=True)
    summary = {}
    for v in args.videos:
        base = os.path.splitext(os.path.basename(v))[0]
        out_path = os.path.join(args.out_dir, f"{base}_annotated.mp4")
        res = run(v, out_path)
        if "events" in res:
            print(f"{v}: {res['frames']} frames, {len(res['events'])} scored "
                  f"windows, max anomaly {res['max_score']:.3f} -> {out_path}")
            summary[v] = {k: res[k] for k in ("frames", "out_path", "max_score")}
            summary[v]["num_events"] = len(res["events"])
        else:
            print(f"{v}: {res['frames']} frames, {res['detections']} tracked "
                  f"detections -> {out_path}")
            summary[v] = res
    if args.output:
        with open(args.output, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()

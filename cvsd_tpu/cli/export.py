"""Export serving artifacts (StableHLO via jax.export) — `yolo export` parity.

Emits a self-contained serialized program (weights baked in, symbolic batch
dim) runnable from any PJRT runtime without this framework.

    # detector (letterbox -> backbone -> decode -> NMS), any batch size
    python -m cvsd_tpu.cli.export --detector_checkpoint det.msgpack \
        --output det.stablehlo --platforms cpu tpu

    # Shopformer anomaly scorer
    python -m cvsd_tpu.cli.export --checkpoint stage2_best.msgpack \
        --output scorer.stablehlo
"""

from __future__ import annotations

import argparse
import os

from cvsd_tpu.cli.common import add_config_args


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--detector_checkpoint", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None, help="Shopformer checkpoint")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms (default: current backend + tpu)")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max_detections", type=int, default=128)
    p.add_argument("--tta_flip", action="store_true")
    args = p.parse_args(argv)
    if not args.detector_checkpoint and not args.checkpoint:
        p.error("one of --detector_checkpoint / --checkpoint is required")

    from cvsd_tpu.serve.export import save_exported

    if args.detector_checkpoint:
        from cvsd_tpu.models.detector import load_detector_checkpoint
        from cvsd_tpu.serve.export import export_detector

        model, variables, _meta = load_detector_checkpoint(args.detector_checkpoint)
        exp = export_detector(model, variables, conf_thresh=args.conf,
                              iou_thresh=args.iou,
                              max_detections=args.max_detections,
                              platforms=args.platforms, tta_flip=args.tta_flip)
        save_exported(exp, args.output)
        print(f"detector -> {args.output} ({os.path.getsize(args.output)//1024} KiB, "
              f"platforms {list(exp.platforms)}, "
              f"images (b,{model.img_size},{model.img_size},3) f32)")
    else:
        from cvsd_tpu.eval.evaluate import load_model
        from cvsd_tpu.serve.export import export_scorer

        scorer = load_model(args.checkpoint)
        exp = export_scorer(scorer, platforms=args.platforms)
        save_exported(exp, args.output)
        m = scorer.config["model"]
        print(f"scorer -> {args.output} ({os.path.getsize(args.output)//1024} KiB, "
              f"platforms {list(exp.platforms)}, poses "
              f"(b,{m.get('seq_len',12)},{m.get('num_keypoints',18)},"
              f"{m.get('in_channels',2)}) f32)")


if __name__ == "__main__":
    main()

"""Import an ultralytics yolov5*u checkpoint into a detector checkpoint.

The reference loads pretrained weights directly (/root/reference/model.py:18,
./models/yolov5mu.pt). This CLI maps that torch checkpoint onto
PersonDetector(head_variant='v8dfl') and saves a framework checkpoint usable
by every detector consumer (--detector_checkpoint of cli.preprocess /
cli.stream, DetectionPipeline, fine-tuning via DetectorTrainer).

    python -m cvsd_tpu.cli.import_yolo --torch_checkpoint yolov5mu.pt \
        --output checkpoints/yolov5mu.msgpack
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_checkpoint", required=True, help=".pt file (ultralytics u-series)")
    p.add_argument("--output", required=True, help="output .msgpack path")
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--width_mult", type=float, default=0.75, help="0.75 = v5m")
    p.add_argument("--depth_mult", type=float, default=0.67, help="0.67 = v5m")
    p.add_argument("--pose_head", action="store_true",
                   help="add an (untrained) keypoint branch for fine-tuning")
    p.add_argument("--non_strict", action="store_true",
                   help="tolerate missing checkpoint keys")
    p.add_argument("--unsafe", action="store_true",
                   help="allow full torch unpickling (executes code from the "
                        "file) when weights_only=True loading fails; only for "
                        "trusted checkpoints")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.utils.checkpoint import save_checkpoint
    from cvsd_tpu.utils.yolo_import import import_yolov5u, load_torch_checkpoint

    model = PersonDetector(
        img_size=args.img_size, width_mult=args.width_mult, depth_mult=args.depth_mult,
        num_keypoints=17 if args.pose_head else 0, head_variant="v8dfl",
        dtype=jnp.bfloat16,
    )
    sd = load_torch_checkpoint(args.torch_checkpoint, allow_unsafe_load=args.unsafe)
    variables = import_yolov5u(sd, model=model, strict=not args.non_strict)
    det_cfg = {
        "img_size": model.img_size, "width_mult": model.width_mult,
        "depth_mult": model.depth_mult, "pose_head": bool(model.num_keypoints),
        "num_keypoints": model.num_keypoints, "head_variant": "v8dfl",
        "num_classes": model.num_classes, "reg_max": model.reg_max,
        "dtype": "bfloat16",
    }
    save_checkpoint(args.output, jax.device_get(variables),
                    config={"detector": det_cfg}, source=args.torch_checkpoint)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"imported {args.torch_checkpoint} -> {args.output} ({n:,} params)")


if __name__ == "__main__":
    main()

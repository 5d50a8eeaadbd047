"""Accuracy cost of int8 PTQ on a REAL trained detector: AP@50 + keypoint RMS,
float vs quantized, same held-out hard scenes as train_detector_hard.py.

Companion of examples/bench_int8.py (speed) — together they price the int8
serving path (models/detector_int8.py) on the hard-scene detector instead of
random weights. Calibration uses rendered training-distribution scenes.

    python examples/train_detector_hard.py --save-checkpoint /tmp/hard_det.msgpack
    python examples/eval_int8_accuracy.py --checkpoint /tmp/hard_det.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="detector checkpoint from train_detector_hard.py --save-checkpoint")
    ap.add_argument("--eval-size", type=int, default=128)
    ap.add_argument("--max-persons", type=int, default=4)
    ap.add_argument("--calib-batches", type=int, default=8)
    ap.add_argument("--calib-batch", type=int, default=16)
    ap.add_argument("--margin", type=float, default=1.0)
    ap.add_argument("--qat-steps", type=int, default=0,
                    help="optional fake-quant fine-tune steps (train/qat.py) "
                         "before re-evaluating — the PTQ-loss recovery path")
    ap.add_argument("--qat-lr", type=float, default=1e-4)
    ap.add_argument("--qat-batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0, help="must match the training run")
    ap.add_argument("--out", default="examples/int8_accuracy_results.json")
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-registers a TPU
    # backend (the env var alone does not win -- CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from cvsd_tpu.data.render import rendered_scene_batch
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
    from cvsd_tpu.eval.detection import evaluate_detector
    from cvsd_tpu.models.detector import load_detector_checkpoint, make_detect_fn
    from cvsd_tpu.models.detector_int8 import quantize_detector

    model, variables, _meta = load_detector_checkpoint(args.checkpoint)
    img = model.img_size
    ds = SyntheticPoseLiftDataset(num_samples=64, seq_len=8, anomaly_ratio=0.5, seed=7)
    seq_source = ds.poses.reshape(-1, 17, 2)

    # calibration scenes: training distribution, fresh stream
    calib_rng = np.random.default_rng(args.seed + 5000)
    calib = [rendered_scene_batch(calib_rng, args.calib_batch, img,
                                  args.max_persons, seq_source)[0]
             for _ in range(args.calib_batches)]
    qmodel, qvars = quantize_detector(model, variables, calib, margin=args.margin)

    # identical held-out protocol to train_detector_hard.py
    eval_rng = np.random.default_rng(args.seed + 1000)
    ev_imgs, ev_b, ev_v, ev_k = rendered_scene_batch(
        eval_rng, args.eval_size, img, args.max_persons, seq_source)

    results = {}
    for name, m, v in (("float", model, variables), ("int8", qmodel, qvars)):
        detect = make_detect_fn(m, conf_thresh=0.25, iou_thresh=0.45, max_detections=16)
        res = evaluate_detector(detect, v, ev_imgs, ev_b, ev_v, ev_k,
                                coco_map=True)
        results[name] = {"ap50": res["ap"], "map50_95": res.get("map50_95"),
                         "pose_map50_95": res.get("pose_map50_95"),
                         "num_pred": int(res["num_pred"]),
                         "keypoints": res.get("keypoints")}
        print(f"{name}: AP@50 {res['ap']:.4f}  mAP50-95 {res.get('map50_95', 0):.4f}"
              f"  preds {res['num_pred']}", flush=True)

    if args.qat_steps:
        from cvsd_tpu.models.detector_int8 import finalize_qat, prepare_qat
        from cvsd_tpu.train.qat import QATFineTuner

        qat_model, qat_vars = prepare_qat(model, variables, calib,
                                          margin=args.margin)
        tuner = QATFineTuner(qat_model, qat_vars, lr=args.qat_lr,
                             total_steps=args.qat_steps,
                             warmup_steps=args.qat_steps // 10)
        ft_rng = np.random.default_rng(args.seed + 9000)
        chunk = 25
        done = 0
        while done < args.qat_steps:
            n = min(chunk, args.qat_steps - done)
            batches = [rendered_scene_batch(ft_rng, args.qat_batch, img,
                                            args.max_persons, seq_source)
                       for _ in range(n)]
            out = tuner.train_steps_scan(
                np.stack([b[0] for b in batches]),
                np.stack([b[1] for b in batches]),
                np.stack([b[2] for b in batches]),
                np.stack([b[3] for b in batches]) if model.num_keypoints else None)
            done += n
            print(f"  qat {done}/{args.qat_steps} loss {out['losses'][-1]:.3f}",
                  flush=True)
        serving_vars = finalize_qat(tuner.variables)
        detect = make_detect_fn(qmodel, conf_thresh=0.25, iou_thresh=0.45,
                                max_detections=16)
        res = evaluate_detector(detect, serving_vars, ev_imgs, ev_b, ev_v, ev_k,
                                coco_map=True)
        results["int8_qat"] = {"ap50": res["ap"], "map50_95": res.get("map50_95"),
                               "pose_map50_95": res.get("pose_map50_95"),
                               "num_pred": int(res["num_pred"]),
                               "keypoints": res.get("keypoints"),
                               "steps": args.qat_steps}
        print(f"int8+qat: AP@50 {res['ap']:.4f}  preds {res['num_pred']}", flush=True)

    results["ap50_delta"] = results["int8"]["ap50"] - results["float"]["ap50"]
    results["eval_scenes"] = args.eval_size
    results["calib_frames"] = args.calib_batches * args.calib_batch
    results["margin"] = args.margin
    print(json.dumps(results))
    with open(args.out, "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()

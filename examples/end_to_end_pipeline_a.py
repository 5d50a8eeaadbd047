"""Pipeline A end to end: videos -> preprocess CSVs -> XceptionTime -> AUC.

The reference's Pipeline A (preprocess.py -> dataset.py -> train.py) was
never demonstrated working (its loader is broken, its MIL loss is `pass`,
main.py crashes). This example runs OUR working equivalent on synthetic
UCF-Crime-style data, end to end:

1. render a dataset directory in the reference's on-disk layout:
   `Shoplifting/*.mp4` (anomalous pose motion) + `Shopping/*.mp4` (normal),
   listed in Anomaly_Train.txt — same for a held-out test list
2. train the detector briefly on rendered scenes (or load a checkpoint)
3. `preprocess_ucf_crime` (pipeline/preprocess.py): multiplexed decode ->
   DP detect -> track -> the reference's two-CSV routing, for train AND test
4. train XceptionTimeClassifier on the train-CSV windows
   (cli.train_tabular's path; reference train.py:4-15)
5. score held-out test windows; report window AUC and video AUC (mean/max
   aggregation over a video's window probabilities)

Run (real TPU): python examples/end_to_end_pipeline_a.py
Quick CPU smoke: JAX_PLATFORMS=cpu python examples/end_to_end_pipeline_a.py \
    --videos-per-class 6 --test-per-class 3 --det-steps 40 --epochs 5 --img 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset_dir(out: str, tag: str, n_per_class: int, frames: int,
                      seed0: int) -> str:
    """Render Shoplifting/ + Shopping/ videos and write Anomaly_Train.txt."""
    from cvsd_tpu.data.render import render_pose_video
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset

    root = os.path.join(out, tag)
    lines = []
    for label, anomaly_ratio, seed in (("Shoplifting", 1.0, seed0),
                                       ("Shopping", 0.0, seed0 + 1)):
        ds = SyntheticPoseLiftDataset(n_per_class, seq_len=frames,
                                      anomaly_ratio=anomaly_ratio, seed=seed)
        os.makedirs(os.path.join(root, label), exist_ok=True)
        for i in range(n_per_class):
            name = f"{label}{i:03d}_x264.mp4"
            p = os.path.join(root, label, name)
            if not os.path.exists(p):
                render_pose_video(p, ds.poses[i], seed=seed * 1000 + i)
            lines.append(f"{label}/{name}")
    with open(os.path.join(root, "Anomaly_Train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos-per-class", type=int, default=64)
    ap.add_argument("--test-per-class", type=int, default=16)
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--img", type=int, default=128, help="detector canvas")
    ap.add_argument("--det-steps", type=int, default=1500)
    ap.add_argument("--detector-checkpoint", default=None,
                    help="skip detector training; load this checkpoint")
    ap.add_argument("--seq-len", type=int, default=32)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--nf", type=int, default=16)
    ap.add_argument("--max-streams", type=int, default=8)
    ap.add_argument("--out", default="/tmp/e2e_pipeline_a")
    ap.add_argument("--artifact", default="/tmp/pipeline_a_results.json")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-registers a TPU
    # backend (the env var alone does not win -- CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.data.render import rendered_detection_batch
    from cvsd_tpu.data.ucf_crime import ANOMALY_CSV, NORMAL_CSV
    from cvsd_tpu.models.detector import PersonDetector, load_detector_checkpoint
    from cvsd_tpu.models.xception_time import (XceptionTimeClassifier,
                                               windows_from_bbox_csv)
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline, preprocess_ucf_crime
    from cvsd_tpu.train.detector_train import DetectorTrainer
    from cvsd_tpu.utils.metrics import compute_auc_roc

    print(f"backend={jax.default_backend()}", flush=True)

    # 1. dataset directories (reference on-disk layout)
    train_dir = build_dataset_dir(args.out, "train", args.videos_per_class,
                                  args.frames, seed0=40)
    test_dir = build_dataset_dir(args.out, "test", args.test_per_class,
                                 args.frames, seed0=60)

    # 2. detector
    if args.detector_checkpoint:
        _, det_variables, _ = load_detector_checkpoint(args.detector_checkpoint)
    else:
        model = PersonDetector(img_size=args.img, width_mult=0.25, depth_mult=0.34,
                               dtype=jnp.float32)
        trainer = DetectorTrainer(model, lr=2e-3, total_steps=args.det_steps,
                                  warmup_steps=min(100, args.det_steps // 5),
                                  ema_decay=0.998)
        rng = np.random.default_rng(0)
        done = 0
        while done < args.det_steps:
            n = min(200, args.det_steps - done)
            data = [rendered_detection_batch(rng, 8, args.img) for _ in range(n)]
            out_s = trainer.train_steps_scan(
                np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
                np.stack([d[2] for d in data]))
            done += n
            print(f"  det {done}/{args.det_steps}: {out_s['losses'][-1]:.2f}", flush=True)
        det_variables = trainer.ema_variables

    cfg = get_default_config()
    cfg["detector"].update(img_size=args.img, width_mult=0.25, depth_mult=0.34,
                           batch_size=16, conf_threshold=0.3, max_detections=4,
                           dtype="float32", host_letterbox="content")
    pipeline = DetectionPipeline(cfg, variables=det_variables)

    # 3. preprocess both splits (reference CSV routing: anomaly vs normal).
    # The CSV writer is append-mode (reference parity); start each run clean
    # so a rerun over a reused --out directory cannot double the dataset.
    stats = {}
    for split, d in (("train", train_dir), ("test", test_dir)):
        for csv_name in (ANOMALY_CSV, NORMAL_CSV):
            p = os.path.join(d, csv_name)
            if os.path.exists(p):
                os.remove(p)
        t0 = time.time()
        s = preprocess_ucf_crime(cfg, d, pipeline=pipeline, verbose=False,
                                 max_streams=args.max_streams)
        stats[split] = {"videos": s["videos"], "frames": s["frames"],
                        "rows": s["rows"], "seconds": round(time.time() - t0, 1)}
        print(f"preprocess[{split}]: {json.dumps(stats[split])}", flush=True)

    # 4. train the tabular classifier on the train-CSV windows
    train_csvs = [os.path.join(train_dir, ANOMALY_CSV),
                  os.path.join(train_dir, NORMAL_CSV)]
    X, y = windows_from_bbox_csv(train_csvs, seq_len=args.seq_len, stride=args.stride)
    print(f"train windows: {X.shape}, anomalous {int(y.sum())}/{len(y)}", flush=True)
    clf = XceptionTimeClassifier(seq_len=args.seq_len, num_channels=X.shape[-1],
                                 nf=args.nf)
    hist = clf.train(X, y, epochs=args.epochs, verbose=False)
    print(f"final train epoch: {hist['history'][-1]}", flush=True)

    # 5. held-out evaluation: window AUC + video-level aggregation
    test_csvs = [os.path.join(test_dir, ANOMALY_CSV),
                 os.path.join(test_dir, NORMAL_CSV)]
    Xt, yt, clips = windows_from_bbox_csv(test_csvs, seq_len=args.seq_len,
                                          stride=args.stride, return_clips=True)
    probs = clf.predict_proba(Xt)[:, 1]
    window_auc, _, _ = compute_auc_roc(yt, probs)
    vids = {}
    for c, p, lab in zip(clips, probs, yt):
        vids.setdefault(int(c), {"probs": [], "label": int(lab)})["probs"].append(float(p))
    vlabels = [v["label"] for v in vids.values()]
    v_mean = [float(np.mean(v["probs"])) for v in vids.values()]
    v_max = [float(np.max(v["probs"])) for v in vids.values()]
    video_auc_mean, _, _ = compute_auc_roc(vlabels, v_mean)
    video_auc_max, _, _ = compute_auc_roc(vlabels, v_max)

    results = {
        "window_auc": round(float(window_auc), 4),
        "video_auc_mean_agg": round(float(video_auc_mean), 4),
        "video_auc_max_agg": round(float(video_auc_max), 4),
        "test_windows": int(len(yt)), "test_videos": len(vids),
        "train_windows": int(len(y)), "preprocess": stats,
        "config": {"videos_per_class": args.videos_per_class,
                   "seq_len": args.seq_len, "stride": args.stride,
                   "epochs": args.epochs, "det_steps": args.det_steps},
    }
    print(json.dumps(results), flush=True)
    with open(args.artifact, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

"""Sweep the Shopformer over a FIXED extracted-pose dataset with seed repeats
— kills the end-to-end window-AUC noise question (RESULTS.md: 0.935 @256
train videos vs 0.878 @512; "fit noise" was asserted, never shown).

Phase A (cached): train detector + top-down pose net on rendered skeletons,
render train/test videos, extract a PoseLift dataset with the trained pose
net — identical protocol to examples/end_to_end_synthetic.py steps 1-2.
Phase B: for each config x seed, train the Shopformer on the SAME extracted
dataset (scan_epoch: whole epoch per dispatch) and record window/video AUC.
Reports mean +/- std per config and writes sweep_extracted.json.

Run (real TPU): python examples/sweep_extracted.py --train-videos 256 --seeds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# config axes swept in phase B (name, dotted overrides)
CONFIGS = [
    ("base_h32_e100", {"model.hidden_channels": 32, "training.stage1_epochs": 100,
                       "training.stage2_epochs": 100, "training.lr": 1e-3}),
    ("h64", {"model.hidden_channels": 64, "training.stage1_epochs": 100,
             "training.stage2_epochs": 100, "training.lr": 1e-3}),
    ("lr3e-4", {"model.hidden_channels": 32, "training.stage1_epochs": 100,
                "training.stage2_epochs": 100, "training.lr": 3e-4}),
    ("tok4", {"model.hidden_channels": 32, "model.num_tokens": 4,
              "training.stage1_epochs": 100, "training.stage2_epochs": 100,
              "training.lr": 1e-3}),
    ("e200", {"model.hidden_channels": 32, "training.stage1_epochs": 200,
              "training.stage2_epochs": 200, "training.lr": 1e-3}),
    ("h32_drop02", {"model.hidden_channels": 32, "model.dropout": 0.2,
                    "training.stage1_epochs": 100, "training.stage2_epochs": 100,
                    "training.lr": 1e-3}),
    # round-3 follow-up: do the two winning axes (tok4, h64) compose?
    ("tok4_h64", {"model.hidden_channels": 64, "model.num_tokens": 4,
                  "training.stage1_epochs": 100, "training.stage2_epochs": 100,
                  "training.lr": 1e-3}),
]


def build_dataset(out: str, img_size: int, steps: int, pose_steps: int,
                  n_train: int, n_test: int) -> str:
    """Phase A: detector + pose training, render, extract. Cached by marker."""
    poselift_dir = os.path.join(out, f"PoseLift_{n_train}")
    marker = os.path.join(poselift_dir, ".complete")
    if os.path.exists(marker):
        print(f"phase A cached: {poselift_dir}")
        return poselift_dir

    import jax.numpy as jnp

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.data.render import (render_pose_video, rendered_detection_batch,
                                      rendered_pose_crop_batch)
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
    from cvsd_tpu.data.ucf_crime import TemporalAnnotation
    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.models.pose_topdown import TopDownPoseNet
    from cvsd_tpu.pipeline.pose_export import export_poselift_dataset
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline
    from cvsd_tpu.train.detector_train import DetectorTrainer
    from cvsd_tpu.train.pose_topdown_train import TopDownPoseTrainer

    rng = np.random.default_rng(0)
    print(f"== phase A: detector ({steps}) + pose ({pose_steps}) + extract {n_train}+{n_test} ==")
    # detector/pose weights are dataset-size independent: cache them in `out`
    # so a --train-videos 512 follow-up reuses the nets trained for 256
    det_ckpt = os.path.join(out, "phaseA_det.msgpack")
    pose_ckpt = os.path.join(out, "phaseA_pose.msgpack")
    if os.path.exists(det_ckpt) and os.path.exists(pose_ckpt):
        from cvsd_tpu.models.detector import load_detector_checkpoint
        from cvsd_tpu.train.pose_topdown_train import load_pose_topdown_checkpoint

        print(f"phase A nets cached: {det_ckpt}, {pose_ckpt}")
        det_model, det_variables, _ = load_detector_checkpoint(det_ckpt)
        pose_model, pose_variables, _ = load_pose_topdown_checkpoint(pose_ckpt)
        return _extract(out, poselift_dir, marker, det_variables,
                        pose_model, pose_variables, img_size, n_train, n_test)
    det_model = PersonDetector(img_size=img_size, width_mult=0.25, depth_mult=0.34,
                               dtype=jnp.float32)
    det_trainer = DetectorTrainer(det_model, lr=2e-3, total_steps=steps,
                                  warmup_steps=100, ema_decay=0.998)
    done = 0
    while done < steps:
        n = min(200, steps - done)
        data = [rendered_detection_batch(rng, 8, img_size) for _ in range(n)]
        out_s = det_trainer.train_steps_scan(
            np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
            np.stack([d[2] for d in data]))
        done += n
        print(f"  det {done}: {out_s['losses'][-1]:.2f}", flush=True)

    pose_model = TopDownPoseNet(num_keypoints=17, width=32, crop_size=64)
    pose_trainer = TopDownPoseTrainer(pose_model, lr=1e-3, total_steps=pose_steps)
    done = 0
    while done < pose_steps:
        n = min(250, pose_steps - done)
        data = [rendered_pose_crop_batch(rng, 32) for _ in range(n)]
        out_s = pose_trainer.train_steps_scan(
            np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
            np.stack([d[2] for d in data]))
        done += n
        print(f"  pose {done}: {out_s['losses'][-1]:.5f}", flush=True)

    det_trainer.save(det_ckpt)  # EMA weights — what extraction uses below
    pose_trainer.save(pose_ckpt)
    return _extract(out, poselift_dir, marker, det_trainer.ema_variables,
                    pose_model, pose_trainer.variables, img_size, n_train, n_test)


def _extract(out, poselift_dir, marker, det_variables,
             pose_model, pose_variables, img_size, n_train, n_test):
    """Render train/test videos (cached by file) and extract the PoseLift
    dataset with the trained detector + top-down pose net."""
    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.data.render import render_pose_video
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
    from cvsd_tpu.data.ucf_crime import TemporalAnnotation
    from cvsd_tpu.pipeline.pose_export import export_poselift_dataset
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline

    cfg = get_default_config()
    cfg["detector"].update(img_size=img_size, width_mult=0.25, depth_mult=0.34,
                           batch_size=16, conf_threshold=0.3, max_detections=4,
                           dtype="float32", pose_mode="topdown")
    det_pipeline = DetectionPipeline(cfg, variables=det_variables,
                                     pose_model=pose_model,
                                     pose_variables=pose_variables)
    T_VID = 72
    n_half = n_test // 2
    train_videos = []
    train_ds = SyntheticPoseLiftDataset(n_train, seq_len=T_VID, anomaly_ratio=0.0, seed=20)
    vid_dir = os.path.join(out, "videos")
    os.makedirs(vid_dir, exist_ok=True)
    for i in range(n_train):
        p = os.path.join(vid_dir, f"train_{i}.mp4")
        if not os.path.exists(p):
            render_pose_video(p, train_ds.poses[i], seed=200 + i)
        train_videos.append(p)
    test_videos, annotations = [], {}
    norm = SyntheticPoseLiftDataset(n_half, seq_len=T_VID, anomaly_ratio=0.0, seed=30)
    anom = SyntheticPoseLiftDataset(n_half, seq_len=T_VID, anomaly_ratio=1.0, seed=31)
    for kind, ds in (("normal", norm), ("anomalous", anom)):
        for i in range(n_half):
            name = f"test_{kind}_{i}"
            p = os.path.join(vid_dir, f"{name}.mp4")
            if not os.path.exists(p):
                render_pose_video(p, ds.poses[i], seed=300 + i)
            test_videos.append(p)
            annotations[name] = TemporalAnnotation(
                name, kind, [(1, T_VID)] if kind == "anomalous" else [])
    export_poselift_dataset(det_pipeline, train_videos, poselift_dir, "Train", verbose=False)
    export_poselift_dataset(det_pipeline, test_videos, poselift_dir, "Test",
                            annotations=annotations, verbose=False)
    with open(marker, "w") as f:
        f.write("ok")
    return poselift_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-videos", type=int, default=256)
    ap.add_argument("--test-videos", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--pose-steps", type=int, default=3000)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--configs", nargs="*", default=None,
                    help="subset of config names to run")
    ap.add_argument("--out", default="/tmp/sweep_extracted")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-registers a TPU
    # backend (the env var alone does not win -- CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    poselift_dir = build_dataset(args.out, args.img_size, args.steps,
                                 args.pose_steps, args.train_videos, args.test_videos)

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.train.loop import Trainer

    results = []
    todo = [(n, o) for n, o in CONFIGS if not args.configs or n in args.configs]
    for name, overrides in todo:
        aucs, vid_aucs = [], []
        for seed in range(args.seeds):
            cfg = get_default_config()
            cfg["data"].update(dataset="poselift", data_dir=poselift_dir,
                               batch_size=64, stride=6)
            cfg["training"].update(scan_epoch=True, scheduler="cosine_warmup")
            cfg["experiment"].update(seed=1000 + seed,
                                     checkpoint_dir=os.path.join(
                                         args.out, f"run_{name}_s{seed}"))
            for k, v in overrides.items():
                node = cfg
                ks = k.split(".")
                for kk in ks[:-1]:
                    node = node[kk]
                node[ks[-1]] = v
            t0 = time.time()
            artifact = Trainer(cfg, verbose=False).setup().fit()
            auc = artifact["test_metrics"]["auc_roc"]
            vm = artifact.get("video_metrics") or {}
            vauc = vm.get("mean", {}).get("auc_roc")
            aucs.append(auc)
            vid_aucs.append(vauc)
            print(f"  {name} seed{seed}: window AUC {auc:.4f} "
                  f"video(mean) {vauc if vauc is None else round(vauc, 4)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        row = {"config": name, "overrides": overrides,
               "window_auc_mean": float(np.mean(aucs)),
               "window_auc_std": float(np.std(aucs)),
               "window_aucs": aucs,
               "video_auc_mean": float(np.mean([v for v in vid_aucs if v is not None]))
               if any(v is not None for v in vid_aucs) else None,
               "video_aucs": vid_aucs}
        results.append(row)
        print(json.dumps({k: row[k] for k in
                          ("config", "window_auc_mean", "window_auc_std")}), flush=True)
        with open(os.path.join(args.out, "sweep_extracted.json"), "w") as f:
            json.dump({"train_videos": args.train_videos, "seeds": args.seeds,
                       "results": results}, f, indent=2)
    ranked = sorted(results, key=lambda r: r["window_auc_mean"], reverse=True)
    print("== ranked ==")
    for r in ranked:
        print(f"  {r['config']}: {r['window_auc_mean']:.4f} +/- {r['window_auc_std']:.4f}")


if __name__ == "__main__":
    main()

"""Full synthetic end-to-end demonstration — no real dataset required.

1. Train the detector + pose head on rendered skeleton frames.
2. Train the Shopformer on synthetic pose sequences (normal-only stage 1/2).
3. Render normal and anomalous pose sequences as mp4 videos.
4. Stream the videos through decode -> detect -> pose -> track -> window ->
   Shopformer scoring and report per-video anomaly scores.

Run: python examples/end_to_end_synthetic.py [--steps 150] [--out /tmp/e2e]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000, help="detector training steps")
    p.add_argument("--pose-steps", type=int, default=3000, help="top-down pose net steps")
    p.add_argument("--out", type=str, default="/tmp/e2e_synthetic")
    p.add_argument("--img_size", type=int, default=128)
    p.add_argument("--test-videos", type=int, default=32,
                   help="held-out videos (half normal, half anomalous)")
    p.add_argument("--train-videos", type=int, default=256,
                   help="normal videos for Shopformer training — window AUC is "
                        "data-limited below ~64 (RESULTS.md progression)")
    p.add_argument("--epochs", type=int, default=100, help="shopformer epochs/stage")
    p.add_argument("--frame-strides", default="1",
                   help="comma list; streams the test videos once per stride "
                        "and reports videos/hour + AUC for each (the "
                        "throughput/accuracy trade of detector.frame_stride)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-registers a TPU
    # backend (the env var alone does not win -- CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.data.render import render_pose_video, rendered_detection_batch
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.models.shopformer import build_shopformer
    from cvsd_tpu.pipeline.streaming import StreamingPipeline
    from cvsd_tpu.train.detector_train import DetectorTrainer
    from cvsd_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)

    # 1a. box detector on rendered skeletons --------------------------------
    # lax.scan-batched steps: N optimizer updates in one device dispatch
    print(f"== training box detector on rendered skeletons ({args.steps} steps) ==")
    det_model = PersonDetector(img_size=args.img_size, width_mult=0.25, depth_mult=0.34,
                               dtype=jnp.float32)
    det_trainer = DetectorTrainer(det_model, lr=2e-3,
                                  total_steps=args.steps, warmup_steps=100,
                                  ema_decay=0.998)
    chunk = 200
    done = 0
    while done < args.steps:
        n = min(chunk, args.steps - done)
        data = [rendered_detection_batch(rng, 8, args.img_size) for _ in range(n)]
        out = det_trainer.train_steps_scan(
            np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
            np.stack([d[2] for d in data]),
        )
        done += n
        print(f"  steps {done}: loss {out['losses'][0]:.2f} -> {out['losses'][-1]:.2f}",
              flush=True)

    det_trainer.save(os.path.join(args.out, "detector.msgpack"), steps=args.steps)

    # 1b. TOP-DOWN pose net on crops ----------------------------------------
    # (one-stage center-cell keypoint regression converges to the mean pose —
    #  RESULTS.md; the crop-based soft-argmax net actually reads the pixels)
    print(f"== training top-down pose net ({args.pose_steps} steps) ==")
    from cvsd_tpu.data.render import rendered_pose_crop_batch
    from cvsd_tpu.models.pose_topdown import TopDownPoseNet, pose_from_boxes
    from cvsd_tpu.train.pose_topdown_train import TopDownPoseTrainer

    pose_model = TopDownPoseNet(num_keypoints=17, width=32, crop_size=64)
    pose_trainer = TopDownPoseTrainer(pose_model, lr=1e-3, total_steps=args.pose_steps)
    done = 0
    while done < args.pose_steps:
        n = min(250, args.pose_steps - done)
        data = [rendered_pose_crop_batch(rng, 32) for _ in range(n)]
        out = pose_trainer.train_steps_scan(
            np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
            np.stack([d[2] for d in data]))
        done += n
        print(f"  pose steps {done}: loss {out['losses'][-1]:.5f}", flush=True)
    pose_trainer.save(os.path.join(args.out, "pose_topdown.msgpack"), steps=args.pose_steps)

    # pose quality gate: frame-pixel keypoint RMS on held-out renders — this
    # is the number that bounds downstream anomaly-score separability
    ev_f, ev_b, ev_k = rendered_pose_crop_batch(np.random.default_rng(9999), 128,
                                                joint_jitter=0.0)
    kp, _ = pose_from_boxes(pose_model, pose_trainer.variables, jnp.asarray(ev_f),
                            jnp.asarray(ev_b)[:, None, :])
    err = np.linalg.norm(np.asarray(kp)[:, 0, :, :2] - ev_k, axis=-1)
    bw = np.clip(ev_b[:, 2] - ev_b[:, 0], 1, None)[:, None]
    print(f"  held-out pose RMS: {np.sqrt((err ** 2).mean()):.2f} px "
          f"({np.sqrt(((err / bw) ** 2).mean()):.3f} box-normalized)", flush=True)

    # 2. render videos and EXTRACT a PoseLift dataset with the trained pose
    #    net — the Shopformer then trains on the same pose distribution it
    #    will see at inference time (domain-matched, the real protocol)
    print("== rendering videos + extracting PoseLift dataset ==")
    from cvsd_tpu.data.ucf_crime import TemporalAnnotation
    from cvsd_tpu.pipeline.pose_export import export_poselift_dataset
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline

    cfg = get_default_config()
    cfg["detector"].update(img_size=args.img_size, width_mult=0.25, depth_mult=0.34,
                           batch_size=16, conf_threshold=0.3, max_detections=4,
                           dtype="float32", pose_mode="topdown")
    det_pipeline = DetectionPipeline(cfg, variables=det_trainer.ema_variables,
                                     pose_model=pose_model,
                                     pose_variables=pose_trainer.variables)

    poselift_dir = os.path.join(args.out, "PoseLift")
    T_VID = 72
    n_train, n_half = args.train_videos, args.test_videos // 2
    train_videos = []
    train_ds = SyntheticPoseLiftDataset(n_train, seq_len=T_VID, anomaly_ratio=0.0, seed=20)
    for i in range(n_train):
        p = os.path.join(args.out, f"train_{i}.mp4")
        render_pose_video(p, train_ds.poses[i], seed=200 + i)
        train_videos.append(p)
    test_videos, annotations, truth = [], {}, {}
    norm = SyntheticPoseLiftDataset(n_half, seq_len=T_VID, anomaly_ratio=0.0, seed=30)
    anom = SyntheticPoseLiftDataset(n_half, seq_len=T_VID, anomaly_ratio=1.0, seed=31)
    for kind, ds in (("normal", norm), ("anomalous", anom)):
        for i in range(n_half):
            name = f"test_{kind}_{i}"
            p = os.path.join(args.out, f"{name}.mp4")
            render_pose_video(p, ds.poses[i], seed=300 + i)
            test_videos.append(p)
            truth[name] = int(kind == "anomalous")
            ranges = [(1, T_VID)] if kind == "anomalous" else []
            annotations[name] = TemporalAnnotation(name, kind, ranges)
    export_poselift_dataset(det_pipeline, train_videos, poselift_dir, "Train", verbose=False)
    export_poselift_dataset(det_pipeline, test_videos, poselift_dir, "Test",
                            annotations=annotations, verbose=False)

    # 3. Shopformer on the EXTRACTED poses -----------------------------------
    print("== training shopformer on extracted pose sequences ==")
    cfg["data"].update(dataset="poselift", data_dir=poselift_dir, batch_size=64, stride=6)
    # sweep-winning recipe (examples/sweep_extracted.py, RESULTS.md round 3):
    # num_tokens=4 at hidden 32 gave window AUC 0.953 +/- 0.008 over 3 seeds
    cfg["model"].update(hidden_channels=32, num_tokens=4)
    cfg["training"].update(stage1_epochs=args.epochs, stage2_epochs=args.epochs, lr=1e-3,
                           scan_epoch=True, scheduler="cosine_warmup")
    cfg["experiment"]["checkpoint_dir"] = os.path.join(args.out, "shopformer")
    trainer = Trainer(cfg, verbose=False).setup()
    artifact = trainer.fit()
    print(f"  END-TO-END extracted-pose test AUC: {artifact['test_metrics']['auc_roc']:.4f}")
    print(f"  video-level: { {k: round(v['auc_roc'],4) for k,v in (artifact['video_metrics'] or {}).items()} }")

    # 4. stream fresh videos through the live pipeline ----------------------
    print("== streaming decode -> detect -> pose -> shopformer ==")
    model = build_shopformer(cfg)
    variables = {"params": trainer._params, "batch_stats": trainer._batch_stats}
    scorer = ShopformerScorer(model, variables, cfg)
    pipe = StreamingPipeline(cfg, scorer, detector_variables=det_trainer.ema_variables,
                             pose_model=pose_model, pose_variables=pose_trainer.variables)
    out = pipe.stream_videos_concurrent(test_videos, max_streams=8)
    agg = pipe.aggregate_events(out["events"])

    # frame-stride A/B: detect every Nth frame, tracker bridges the gaps —
    # videos/hour vs video-AUC trade (VERDICT r3 #4); warm pass first so each
    # stride's number is steady-state, not compile-polluted
    from cvsd_tpu.eval.streaming_eval import evaluate_streaming as _eval_stream

    stride_table = {}
    strides = [int(s) for s in str(args.frame_strides).split(",") if s.strip()]
    for s in strides:
        scfg = {**cfg, "detector": {**cfg["detector"], "frame_stride": s}}
        sp = StreamingPipeline(scfg, scorer,
                               detector_variables=det_trainer.ema_variables,
                               pose_model=pose_model,
                               pose_variables=pose_trainer.variables)
        sp.stream_videos_concurrent(test_videos, max_streams=8)  # warm/compile
        so = sp.stream_videos_concurrent(test_videos, max_streams=8)
        sres = _eval_stream(so["events"], list(annotations.values()),
                            include_eventless_videos=test_videos)
        stride_table[s] = {
            "videos_per_hour": so["videos_per_hour"], "fps": so["fps"],
            "video_auc": sres.video_auc, "video_auc_ci": list(sres.video_auc_ci),
            "event_auc": sres.event_auc, "n_events": sres.n_events,
            "stage_seconds": so["stage_seconds"],
        }
        print(f"  frame_stride={s}: {so['videos_per_hour']:.0f} videos/h "
              f"({so['fps']:.1f} fps) video AUC {sres.video_auc:.4f} "
              f"[{sres.video_auc_ci[0]:.3f},{sres.video_auc_ci[1]:.3f}] "
              f"event AUC {sres.event_auc:.4f} ({sres.n_events} windows)",
              flush=True)
    result = {}
    for path in test_videos:
        name = os.path.basename(path)
        stem = os.path.splitext(name)[0]
        result[name] = {"label": truth[stem], **agg.get(name, {})}

    # live GT-join evaluation (eval/streaming_eval.py): video AUC with
    # bootstrap CI over the >=32 held-out videos + window-level event AUC
    from cvsd_tpu.eval.streaming_eval import evaluate_streaming

    streaming = {}
    for agg in ("max", "mean"):
        res = evaluate_streaming(out["events"], list(annotations.values()),
                                 include_eventless_videos=test_videos, aggregation=agg)
        streaming[agg] = res.as_dict()
        print(f"  streaming video AUC ({agg} agg): {res.video_auc:.4f} "
              f"[95% CI {res.video_auc_ci[0]:.4f}, {res.video_auc_ci[1]:.4f}] "
              f"over {res.n_videos} videos")
    print(f"  streaming event (window) AUC: {res.event_auc:.4f} over {res.n_events} windows")
    print(f"  {out['frames']} frames at {out['fps']:.1f} fps, {len(out['events'])} scored windows")
    with open(os.path.join(args.out, "e2e_results.json"), "w") as f:
        json.dump({"videos": result, "frames": out["frames"], "fps": out["fps"],
                   "extracted_pose_auc": artifact["test_metrics"]["auc_roc"],
                   "video_metrics": {k: v["auc_roc"] for k, v in
                                     (artifact["video_metrics"] or {}).items()},
                   "streaming": streaming,
                   "frame_stride": stride_table}, f, indent=2)


if __name__ == "__main__":
    main()

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
    p.add_argument("--steps", type=int, default=800, help="detector training steps")
    p.add_argument("--out", type=str, default="/tmp/e2e_synthetic")
    p.add_argument("--img_size", type=int, default=128)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

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

    # 1. detector + pose head on rendered skeletons -------------------------
    # lax.scan-batched steps: N optimizer updates in one device dispatch
    print(f"== training detector + pose head on rendered skeletons ({args.steps} steps) ==")
    det_model = PersonDetector(img_size=args.img_size, width_mult=0.25, depth_mult=0.34,
                               num_keypoints=17, dtype=jnp.float32)
    det_trainer = DetectorTrainer(det_model, lr=2e-3, kpt_weight=0.3)
    chunk = 200
    done = 0
    while done < args.steps:
        n = min(chunk, args.steps - done)
        data = [rendered_detection_batch(rng, 8, args.img_size) for _ in range(n)]
        out = det_trainer.train_steps_scan(
            np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
            np.stack([d[2] for d in data]), np.stack([d[3] for d in data]),
        )
        done += n
        print(f"  steps {done}: loss {out['losses'][0]:.2f} -> {out['losses'][-1]:.2f}")

    # 2. Shopformer on synthetic pose sequences -----------------------------
    print("== training shopformer on synthetic pose sequences ==")
    cfg = get_default_config()
    cfg["data"]["dataset"] = "synthetic"
    cfg["data"]["synthetic"].update(num_train=256, num_test=128)
    cfg["data"]["batch_size"] = 64
    cfg["model"]["hidden_channels"] = 16
    cfg["training"].update(stage1_epochs=10, stage2_epochs=10, lr=1e-3)
    cfg["experiment"]["checkpoint_dir"] = os.path.join(args.out, "shopformer")
    cfg["detector"].update(img_size=args.img_size, width_mult=0.25, depth_mult=0.34,
                           batch_size=16, conf_threshold=0.15, max_detections=4,
                           dtype="float32", pose_head=True)
    trainer = Trainer(cfg, verbose=False).setup()
    artifact = trainer.fit()
    print(f"  shopformer synthetic test AUC: {artifact['test_metrics']['auc_roc']:.4f}")

    # 3. render videos -------------------------------------------------------
    print("== rendering videos ==")
    normal = SyntheticPoseLiftDataset(4, seq_len=48, anomaly_ratio=0.0, seed=10)
    anomalous = SyntheticPoseLiftDataset(4, seq_len=48, anomaly_ratio=1.0, seed=11)
    videos = {}
    for kind, ds in (("normal", normal), ("anomalous", anomalous)):
        for i in range(2):
            path = os.path.join(args.out, f"{kind}_{i}.mp4")
            render_pose_video(path, ds.poses[i], seed=100 + i)
            videos[path] = kind

    # 4. stream through the full pipeline ------------------------------------
    print("== streaming decode -> detect -> pose -> shopformer ==")
    model = build_shopformer(cfg)
    variables = {"params": trainer._params, "batch_stats": trainer._batch_stats}
    scorer = ShopformerScorer(model, variables, cfg)
    pipe = StreamingPipeline(cfg, scorer, detector_variables=det_trainer.variables)
    out = pipe.stream_videos_concurrent(list(videos), max_streams=4)
    agg = pipe.aggregate_events(out["events"])
    result = {}
    for path, kind in videos.items():
        name = os.path.basename(path)
        result[name] = {"kind": kind, **agg.get(name, {})}
        print(f"  {name} ({kind}): {agg.get(name)}")
    print(f"  {out['frames']} frames at {out['fps']:.1f} fps, "
          f"{len(out['events'])} scored windows")
    with open(os.path.join(args.out, "e2e_results.json"), "w") as f:
        json.dump({"videos": result, "frames": out["frames"], "fps": out["fps"],
                   "shopformer_auc": artifact["test_metrics"]["auc_roc"]}, f, indent=2)


if __name__ == "__main__":
    main()

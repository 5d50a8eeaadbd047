"""Train + evaluate the detector (with pose head) on HARD synthetic scenes.

Round-2 validation of person detection beyond bright rectangles
(VERDICT round 1, item 3i): textured multi-person scenes with scale
variation, real occlusion, clutter distractors and foreground occluders
(data/render.py::render_scene). Reports the detection PR curve (AP@0.5)
and keypoint RMS on a held-out set, writing JSON next to this script.

Usage (real TPU, ~10 min default):
    python examples/train_detector_hard.py [--steps 1200] [--img 320]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _retry(fn, attempts: int = 3, base_sleep: float = 60.0):
    """Retry a device dispatch through transient relay failures.

    The axon relay occasionally drops a request mid-flight (observed
    2026-08-19: `remote_compile: response body closed` at step 650/1200,
    losing 35 min of training). DetectorTrainer only assigns its state
    AFTER a successful dispatch, so re-running the same chunk is safe.
    A wedged relay won't recover within these retries — then we fail and
    the job queue retries the whole job."""
    import jax

    for k in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:
            if k == attempts - 1:
                raise
            wait = base_sleep * (k + 1)
            print(f"transient device error ({e}); retry {k + 1}/{attempts - 1} "
                  f"in {wait:.0f}s", flush=True)
            time.sleep(wait)


def _partial_paths(out: str):
    base = out + ".partial"
    return base + ".msgpack", base + ".json"


def _save_partial(out: str, trainer, done: int, losses) -> None:
    """Atomically persist mid-train state (params/opt/EMA + progress).

    Sessions here die often (relay drops, driver restarts); without this a
    1200-step retrain loses everything mid-run (happened twice: step 650
    then step 500 on 2026-08-19). Saved every scan chunk (~2 min)."""
    import jax
    from flax import serialization

    mp, js = _partial_paths(out)
    state = {"variables": trainer.variables, "opt_state": trainer.opt_state}
    if trainer.ema_params is not None:
        state["ema_params"] = trainer.ema_params
    blob = serialization.to_bytes(jax.device_get(state))
    tmp = mp + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, mp)
    tmp = js + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"done": done, "ema_t": trainer._ema_t,
                   "losses": [float(x) for x in losses]}, f)
    os.replace(tmp, js)


def _load_partial(out: str, trainer):
    """Restore mid-train state if present; returns (done, losses)."""
    from flax import serialization

    mp, js = _partial_paths(out)
    if not (os.path.exists(mp) and os.path.exists(js)):
        return 0, []
    with open(js) as f:
        meta = json.load(f)
    target = {"variables": trainer.variables, "opt_state": trainer.opt_state}
    if trainer.ema_params is not None:
        target["ema_params"] = trainer.ema_params
    with open(mp, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    trainer.variables = state["variables"]
    trainer.opt_state = state["opt_state"]
    if trainer.ema_params is not None:
        trainer.ema_params = state["ema_params"]
    trainer._ema_t = int(meta["ema_t"])
    print(f"resumed from {mp} at step {meta['done']}", flush=True)
    return int(meta["done"]), list(meta["losses"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--img", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scan-chunk", type=int, default=50,
                    help="steps fused per device dispatch (lax.scan)")
    ap.add_argument("--eval-size", type=int, default=128, help="held-out scenes")
    ap.add_argument("--max-persons", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--width", type=float, default=0.375)
    ap.add_argument("--depth", type=float, default=0.34)
    ap.add_argument("--out", default="examples/detector_hard_results.json")
    ap.add_argument("--save-checkpoint", default=None,
                    help="also save the trained detector (.msgpack) for reuse "
                         "(e.g. examples/eval_int8_accuracy.py)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cosine", action="store_true",
                    help="warmup + cosine-decay LR over --steps (trainer "
                         "supports it; flat Adam leaves kpt RMS on the "
                         "table — the round-5 convergence recipe)")
    ap.add_argument("--warmup-steps", type=int, default=200)
    ap.add_argument("--ema", type=float, default=0.0,
                    help="EMA decay for eval/export params (0 = off)")
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-registers a TPU
    # backend (the env var alone does not win -- CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from cvsd_tpu.data.render import rendered_scene_batch
    from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
    from cvsd_tpu.eval.detection import evaluate_detector
    from cvsd_tpu.models.detector import PersonDetector, make_detect_fn
    from cvsd_tpu.train.detector_train import DetectorTrainer

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    ds = SyntheticPoseLiftDataset(num_samples=64, seq_len=8, anomaly_ratio=0.5, seed=7)
    seq_source = ds.poses.reshape(-1, 17, 2)

    model = PersonDetector(img_size=args.img, width_mult=args.width,
                           depth_mult=args.depth, num_keypoints=17)
    trainer = DetectorTrainer(model, lr=args.lr, kpt_weight=0.1,
                              total_steps=args.steps if args.cosine else 0,
                              warmup_steps=args.warmup_steps,
                              ema_decay=args.ema)

    done, losses = _load_partial(args.out, trainer)
    t0 = time.time()
    while done < args.steps:
        n = min(args.scan_chunk, args.steps - done)
        # seed each chunk from (seed, done) so a resumed run draws the same
        # scenes it would have, without replaying earlier chunks on the host
        rng = np.random.default_rng([args.seed, done])
        imgs = np.empty((n, args.batch, args.img, args.img, 3), np.float32)
        gb = np.empty((n, args.batch, args.max_persons, 4), np.float32)
        gv = np.empty((n, args.batch, args.max_persons), bool)
        gk = np.empty((n, args.batch, args.max_persons, 17, 2), np.float32)
        for i in range(n):
            imgs[i], gb[i], gv[i], gk[i] = rendered_scene_batch(
                rng, args.batch, args.img, args.max_persons, seq_source)
        out = _retry(lambda: trainer.train_steps_scan(imgs, gb, gv, gk))
        losses.extend(out["losses"].tolist())
        done += n
        _save_partial(args.out, trainer, done, losses)
        print(f"step {done}/{args.steps} loss {np.mean(out['losses']):.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # held-out eval
    eval_rng = np.random.default_rng(args.seed + 1000)
    ev_imgs, ev_b, ev_v, ev_k = rendered_scene_batch(
        eval_rng, args.eval_size, args.img, args.max_persons, seq_source)
    detect = make_detect_fn(model, conf_thresh=0.25, iou_thresh=0.45, max_detections=16)
    eval_vars = trainer.ema_variables if args.ema else trainer.variables
    res = _retry(lambda: evaluate_detector(detect, eval_vars,
                                           ev_imgs, ev_b, ev_v, ev_k,
                                           coco_map=True))
    summary = {
        "steps": args.steps, "img": args.img, "batch": args.batch,
        "width_mult": args.width, "depth_mult": args.depth,
        "train_loss_first50": float(np.mean(losses[:50])),
        "train_loss_last50": float(np.mean(losses[-50:])),
        "eval_scenes": args.eval_size,
        "ap50": res["ap"], "num_gt": int(res["num_gt"]), "num_pred": int(res["num_pred"]),
        "map50_95": res.get("map50_95"), "map75": res.get("map75"),
        "pose_map50_95": res.get("pose_map50_95"),
        "keypoints": res.get("keypoints"),
        "seconds": round(time.time() - t0, 1),
    }
    summary["cosine"] = args.cosine
    summary["ema"] = args.ema
    if args.save_checkpoint:
        trainer.save(args.save_checkpoint, use_ema=bool(args.ema))
        print(f"saved checkpoint -> {args.save_checkpoint}")
    print(json.dumps(summary, indent=2))
    with open(args.out, "w") as f:
        json.dump({**summary,
                   "precision": res["precision"].tolist()[::max(len(res["precision"]) // 200, 1)],
                   "recall": res["recall"].tolist()[::max(len(res["recall"]) // 200, 1)]}, f)
    for p in _partial_paths(args.out):
        if os.path.exists(p):
            os.remove(p)


if __name__ == "__main__":
    main()

"""Trainer for the top-down pose net (models/pose_topdown.py).

Crops are taken INSIDE the jitted step with the same `crop_and_resize` used
at inference, so train/test resampling is identical. Boxes are the (jittered)
detector boxes; targets are GT keypoints in frame pixels, mapped into crop
space in the loss. Covers the reference capability of producing PoseLift-
grade poses from person detections (the reference consumed an external pose
estimator's output; /root/reference/shopformer/data/poselift_dataset.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvsd_tpu.models.pose_topdown import TopDownPoseNet, crop_and_resize, soft_argmax


def _crop_batch(images, boxes, size):
    return jax.vmap(lambda img, b: crop_and_resize(img, b, size))(images, boxes)


def pose_loss(model: TopDownPoseNet, params, batch_stats, images, boxes, kpts,
              train: bool = True):
    """images (B,H,W,3), boxes (B,4) xyxy px, kpts (B,K,2) px.
    Soft-argmax L2 in crop-normalized space + a small logit regularizer."""
    S = model.crop_size
    crops, origin, scale = _crop_batch(images, boxes, S)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      crops.astype(model.dtype), train=train,
                      mutable=["batch_stats"] if train else [])
    heat, updates = out if train else (out, {"batch_stats": batch_stats})
    coords, _conf = soft_argmax(heat, model.temperature)        # (B, K, 2) in [0,1]
    target = (kpts - origin[:, None, :]) / (S * scale[:, None, :])
    inside = ((target > 0.0) & (target < 1.0)).all(-1)           # (B, K)
    err = jnp.sum((coords - target) ** 2, -1)
    loss = jnp.sum(jnp.where(inside, err, 0.0)) / jnp.maximum(inside.sum(), 1.0)
    return loss, updates["batch_stats"]


class TopDownPoseTrainer:
    """jitted Adam trainer with lax.scan multi-step dispatch (same dispatch
    amortization pattern as DetectorTrainer.train_steps_scan)."""

    def __init__(self, model: TopDownPoseNet, lr: float = 1e-3, seed: int = 0,
                 total_steps: int = 0, warmup_steps: int = 100):
        self.model = model
        self.variables = model.init_variables(jax.random.PRNGKey(seed))
        if total_steps:
            warmup = max(1, min(int(warmup_steps), int(total_steps) // 5))
            lr = optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup, int(total_steps), end_value=lr * 0.01)
        self.opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(lr))
        self.opt_state = self.opt.init(self.variables["params"])
        model_ = model
        opt = self.opt

        def one(carry, batch):
            params, bs, opt_state = carry
            images, boxes, kpts = batch

            def loss_fn(p, b):
                return pose_loss(model_, p, b, images, boxes, kpts)

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bs)
            updates, new_opt = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs, new_opt), loss

        @jax.jit
        def run(params, bs, opt_state, images, boxes, kpts):
            (p, b, o), losses = jax.lax.scan(one, (params, bs, opt_state),
                                             (images, boxes, kpts))
            return p, b, o, losses

        self._run = run
        self._step = jax.jit(lambda p, b, o, i, bx, k: one((p, b, o), (i, bx, k)))

    def train_step(self, images: np.ndarray, boxes: np.ndarray, kpts: np.ndarray) -> float:
        (p, b, o), loss = self._step(
            self.variables["params"], self.variables["batch_stats"], self.opt_state,
            jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(kpts))
        self.variables = {"params": p, "batch_stats": b}
        self.opt_state = o
        return float(loss)

    def train_steps_scan(self, images: np.ndarray, boxes: np.ndarray,
                         kpts: np.ndarray) -> Dict[str, np.ndarray]:
        """Leading axis = steps: images (N,B,H,W,3), boxes (N,B,4), kpts (N,B,K,2)."""
        p, b, o, losses = self._run(
            self.variables["params"], self.variables["batch_stats"], self.opt_state,
            jnp.asarray(images, jnp.float32), jnp.asarray(boxes, jnp.float32),
            jnp.asarray(kpts, jnp.float32))
        self.variables = {"params": jax.device_get(p), "batch_stats": jax.device_get(b)}
        self.opt_state = o
        return {"losses": np.asarray(jax.device_get(losses))}

    def save(self, path: str, config=None, **metadata) -> None:
        from cvsd_tpu.utils.checkpoint import save_checkpoint

        m = self.model
        save_checkpoint(path, jax.device_get(self.variables),
                        config={**(config or {}), "pose_topdown": {
                            "num_keypoints": m.num_keypoints, "width": m.width,
                            "crop_size": m.crop_size, "temperature": m.temperature,
                        }}, **metadata)


def load_pose_topdown_checkpoint(path: str):
    """(TopDownPoseNet, variables, meta) from a TopDownPoseTrainer.save file."""
    from cvsd_tpu.utils.checkpoint import load_checkpoint

    variables, meta = load_checkpoint(path)
    cfg = ((meta or {}).get("config") or {}).get("pose_topdown") or {}
    model = TopDownPoseNet(
        num_keypoints=int(cfg.get("num_keypoints", 17)),
        width=int(cfg.get("width", 32)),
        crop_size=int(cfg.get("crop_size", 64)),
        temperature=float(cfg.get("temperature", 1.0)),
    )
    return model, variables, meta

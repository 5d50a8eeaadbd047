"""Quantization-aware fine-tuning for the int8 detector.

Completes the int8 serving story (models/detector_int8.py): when PTQ alone
costs accuracy, a short fake-quant fine-tune recovers it — the fake-quant
forward sees exactly the serving arithmetic (per-channel int8 weights,
frozen calibrated activation ranges) while gradients flow through
straight-through estimators into the BN-folded float kernels.
finalize_qat() then rounds to the exact serving int8 layout.

The reference's deployment stack (ultralytics -> TensorRT) offers the same
PTQ/QAT pair; here both paths are pure JAX (/root/reference/model.py:14-81).

Usage:
    qat_model, qat_vars = prepare_qat(model, variables, calib_batches)
    tuner = QATFineTuner(qat_model, qat_vars, lr=1e-4)
    for ...: tuner.train_step(images, gt_boxes, gt_valid[, gt_kpts])
    serving_vars = finalize_qat(tuner.variables)   # -> QuantPersonDetector
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvsd_tpu.models.detector_int8 import QuantPersonDetector
from cvsd_tpu.train.detector_train import anchor_centers, detection_loss


def _act_scale_labels(params):
    """'freeze' for act_scale leaves (calibrated ranges stay fixed during
    fine-tuning), 'train' for everything else."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "freeze" if path[-1].key == "act_scale" else "train",
        params)


class QATFineTuner:
    """Jitted fine-tuning driver for the fake-quant detector mirror.

    Same loss/assignment machinery as DetectorTrainer (anchor-free center
    sampling, BCE objectness + IoU box [+ keypoint] loss), but no BatchNorm
    collection — BN is already folded into the trainable kernels — and the
    optimizer masks act_scale leaves frozen.

    mesh_config enables data-parallel fine-tuning exactly like
    DetectorTrainer: params/opt state replicated, batches sharded over the
    mesh's batch axis, gradient all-reduce emitted by XLA."""

    def __init__(self, qat_model: QuantPersonDetector, qat_variables,
                 lr: float = 1e-4, obj_pos_weight: float = 3.0,
                 kpt_weight: float = 0.05, total_steps: int = 0,
                 warmup_steps: int = 0, mesh_config=None):
        assert qat_model.qat, "model must be built with qat=True (qat_model_like)"
        self.model = qat_model
        self.variables = qat_variables
        self.mesh_config = mesh_config
        self.obj_pos_weight = float(obj_pos_weight)
        self.kpt_weight = float(kpt_weight)
        centers, strides = anchor_centers(qat_model.img_size)
        self._centers = jnp.asarray(centers)
        self._strides = jnp.asarray(strides)
        if total_steps:
            warmup = max(1, min(int(warmup_steps), int(total_steps) // 5))
            lr = optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup, int(total_steps), end_value=lr * 0.01)
        inner = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(lr))
        self.opt = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()},
            _act_scale_labels(qat_variables["params"]))
        self.opt_state = self.opt.init(qat_variables["params"])
        if mesh_config is not None:
            from cvsd_tpu.parallel.mesh import replicate

            self.variables = replicate(mesh_config.mesh, self.variables)
            self.opt_state = replicate(mesh_config.mesh, self.opt_state)
        self._step = jax.jit(self._make_step())

    def _shard(self, tree, leading_scan_axis: bool = False):
        """Shard batch arrays over the mesh's data axis (no-op off-mesh).
        With leading_scan_axis, dim 0 is the lax.scan steps axis and dim 1
        is the per-step batch."""
        if self.mesh_config is None:
            return tuple(jnp.asarray(x) for x in tree)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        mesh, axis = self.mesh_config.mesh, self.mesh_config.batch_axis
        lead = (None, axis) if leading_scan_axis else (axis,)
        return tuple(
            jax.device_put(jnp.asarray(x), NamedSharding(
                mesh, P(*lead, *([None] * (x.ndim - len(lead))))))
            for x in tree)

    def _make_step(self):
        model, opt = self.model, self.opt
        centers, strides, size = self._centers, self._strides, self.model.img_size
        pos_w, kpt_w = self.obj_pos_weight, self.kpt_weight

        def step(params, opt_state, images, gt_boxes, gt_valid, gt_kpts):
            def loss_fn(p):
                raw = model.apply({"params": p}, images, train=True)
                return detection_loss(
                    raw, gt_boxes, gt_valid, size, centers, strides,
                    gt_kpts=gt_kpts, num_keypoints=model.num_keypoints,
                    obj_pos_weight=pos_w, kpt_weight=kpt_w,
                    head_variant=model.head_variant,
                    num_classes=model.num_classes, reg_max=model.reg_max)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss, aux

        return step

    def train_step(self, images: np.ndarray, gt_boxes: np.ndarray,
                   gt_valid: np.ndarray,
                   gt_kpts: Optional[np.ndarray] = None) -> Dict[str, float]:
        if self.model.num_keypoints and gt_kpts is None:
            # fabricating zero targets would fine-tune every keypoint toward
            # the canvas origin (same bug class fixed for train_detector)
            raise ValueError(
                "QAT on a pose-head model requires gt_kpts; got None for a "
                f"model with num_keypoints={self.model.num_keypoints}")
        batch = self._shard((images, gt_boxes, gt_valid)
                            + (() if gt_kpts is None else (gt_kpts,)))
        p, self.opt_state, loss, aux = self._step(
            self.variables["params"], self.opt_state, *batch[:3],
            batch[3] if gt_kpts is not None else None)
        self.variables = {"params": p}
        return {"loss": float(loss), **{k: float(v) for k, v in aux.items()}}

    def train_steps_scan(self, images: np.ndarray, gt_boxes: np.ndarray,
                         gt_valid: np.ndarray,
                         gt_kpts: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """N pre-batched steps in ONE dispatch via lax.scan (leading steps
        axis) — the relay-latency amortization used everywhere in this repo."""
        model, opt = self.model, self.opt
        centers, strides, size = self._centers, self._strides, model.img_size
        pos_w, kpt_w = self.obj_pos_weight, self.kpt_weight
        if gt_kpts is None:
            if model.num_keypoints:
                raise ValueError(
                    "QAT on a pose-head model requires gt_kpts; got None for "
                    f"a model with num_keypoints={model.num_keypoints}")
            # keypoint-less model: static placeholder, never used by the loss
            gt_kpts = np.zeros((*gt_boxes.shape[:3], 1, 2), np.float32)

        def one(carry, batch):
            params, opt_state = carry
            imgs, gb, gv, gk = batch

            def loss_fn(p):
                raw = model.apply({"params": p}, imgs, train=True)
                loss, _aux = detection_loss(
                    raw, gb, gv, size, centers, strides,
                    gt_kpts=gk if model.num_keypoints else None,
                    num_keypoints=model.num_keypoints,
                    obj_pos_weight=pos_w, kpt_weight=kpt_w,
                    head_variant=model.head_variant,
                    num_classes=model.num_classes, reg_max=model.reg_max)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt), loss

        @jax.jit
        def run(params, opt_state, images, gt_boxes, gt_valid, gt_kpts):
            (p, os_), losses = jax.lax.scan(
                one, (params, opt_state), (images, gt_boxes, gt_valid, gt_kpts))
            return p, os_, losses

        batch = self._shard(
            (np.asarray(images, np.float32), np.asarray(gt_boxes, np.float32),
             np.asarray(gt_valid), np.asarray(gt_kpts, np.float32)),
            leading_scan_axis=True)
        p, self.opt_state, losses = run(
            self.variables["params"], self.opt_state, *batch)
        self.variables = {"params": p}
        return {"losses": np.asarray(jax.device_get(losses))}

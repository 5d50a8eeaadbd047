"""Person-detector training: anchor-free target assignment, losses, train step.

The reference cannot train its detector at all — it loads pretrained
ultralytics weights (/root/reference/model.py:18) and ships no training code.
This module completes the capability: a jittable FCOS/YOLOv8-style training
path so the TPU detector can be fitted to person data (or the synthetic
rectangle fixture used in tests).

Assignment (static shapes, fully vectorized):
- anchors = all head cells across strides 8/16/32, centers in letterbox px
- positive where the anchor center lies inside a GT box AND within
  `center_radius * stride` of the GT center (center sampling)
- ties resolve to the smallest-area GT

Losses: BCE-with-logits objectness over all anchors (positives = 1),
(1 - IoU) box loss over positives. Everything is pad-and-mask: GT arrives as
(B, max_gt, 4) + validity mask.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvsd_tpu.models.detector import (
    STRIDES,
    PersonDetector,
    decode_predictions,
    decode_predictions_v8,
)
from cvsd_tpu.ops.iou import box_iou_matrix


def anchor_centers(img_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """((A, 2) anchor centers in pixels, (A,) strides) across all levels."""
    centers, strides = [], []
    for s in STRIDES:
        n = img_size // s
        gy, gx = np.mgrid[0:n, 0:n]
        cx = (gx.reshape(-1) + 0.5) * s
        cy = (gy.reshape(-1) + 0.5) * s
        centers.append(np.stack([cx, cy], -1))
        strides.append(np.full(n * n, s))
    return np.concatenate(centers).astype(np.float32), np.concatenate(strides).astype(np.float32)


def assign_targets(
    gt_boxes: jnp.ndarray,   # (B, G, 4) xyxy letterbox px
    gt_valid: jnp.ndarray,   # (B, G) bool
    centers: jnp.ndarray,    # (A, 2)
    strides: jnp.ndarray,    # (A,)
    center_radius: float = 2.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (pos (B, A) bool, target_boxes (B, A, 4), gt_idx (B, A)).

    gt_idx is the matched GT index per anchor (min-area tie-break over the
    inside-and-centered candidates); downstream per-anchor targets (boxes AND
    keypoints) must gather with this same index so a positive anchor never
    regresses toward a different person's keypoints than its box target."""
    cx = centers[None, :, None, 0]  # (1, A, 1)
    cy = centers[None, :, None, 1]
    x1, y1, x2, y2 = (gt_boxes[:, None, :, i] for i in range(4))  # (B, 1, G)
    inside = (cx >= x1) & (cx <= x2) & (cy >= y1) & (cy <= y2)
    gcx, gcy = (x1 + x2) / 2, (y1 + y2) / 2
    r = center_radius * strides[None, :, None]
    centered = (jnp.abs(cx - gcx) <= r) & (jnp.abs(cy - gcy) <= r)
    match = inside & centered & gt_valid[:, None, :]  # (B, A, G)

    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)  # (B, 1, G)
    cost = jnp.where(match, area, jnp.inf)
    gt_idx = jnp.argmin(cost, axis=-1)  # (B, A)
    pos = jnp.any(match, axis=-1)
    target = jnp.take_along_axis(gt_boxes, gt_idx[..., None], axis=1)
    return pos, target, gt_idx


def detection_loss(
    raw: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    img_size: int,
    centers: jnp.ndarray,
    strides: jnp.ndarray,
    box_weight: float = 5.0,
    gt_kpts: Optional[jnp.ndarray] = None,  # (B, G, K, 2) px, optional pose head
    num_keypoints: int = 0,
    kpt_weight: float = 0.05,
    obj_pos_weight: float = 1.0,
    head_variant: str = "anchor_free",
    num_classes: int = 80,
    reg_max: int = 16,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + components from raw head maps (objectness BCE + IoU box
    loss + optional keypoint regression for the pose head).

    head_variant='v8dfl' trains/fine-tunes the ultralytics-u compatible head
    (e.g. after utils/yolo_import): the person-class logit plays the
    objectness role and the box loss flows through the differentiable DFL
    softmax-expectation decode."""
    if head_variant == "v8dfl":
        pred_boxes, _scores, pred_kpts = decode_predictions_v8(
            raw, num_classes, reg_max, num_keypoints)
        obj_ch = 4 * reg_max  # person class logit (class_idx 0)
    else:
        pred_boxes, _scores, pred_kpts = decode_predictions(raw, img_size, num_keypoints)
        obj_ch = 4
    obj_logits = jnp.concatenate(
        [raw[k].astype(jnp.float32)[..., obj_ch].reshape(raw[k].shape[0], -1)
         for k in ("p3", "p4", "p5")],
        axis=1,
    )  # (B, A)
    pos, target, gt_idx = assign_targets(gt_boxes, gt_valid, centers, strides)

    obj_bce = optax.sigmoid_binary_cross_entropy(obj_logits, pos.astype(jnp.float32))
    if obj_pos_weight != 1.0:
        # up-weight positives (sparse vs the anchor sea) for confident scores
        obj_bce = jnp.where(pos, obj_pos_weight * obj_bce, obj_bce)
    obj_loss = obj_bce.mean()

    # IoU loss on positives (diagonal of pairwise per-anchor)
    iou = jax.vmap(jax.vmap(lambda a, b: box_iou_matrix(a[None], b[None])[0, 0]))(pred_boxes, target)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    box_loss = jnp.sum(jnp.where(pos, 1.0 - iou, 0.0)) / n_pos

    total = obj_loss + box_weight * box_loss
    aux = {"obj_loss": obj_loss, "box_loss": box_loss, "n_pos": n_pos}

    if gt_kpts is not None and pred_kpts is not None:
        # gather each positive anchor's assigned GT keypoints with the SAME
        # gt_idx as the box target: keypoint target, `pos`, and the `scale`
        # normalizer must all come from one GT even in crowded/overlapping
        # scenes (ADVICE round 1, medium)
        tk = jnp.take_along_axis(gt_kpts, gt_idx[:, :, None, None], axis=1)  # (B, A, K, 2)
        # scale-normalized L2 on positives
        scale = jnp.maximum(target[..., 2] - target[..., 0], 1.0)[..., None, None]
        err = jnp.sum(((pred_kpts[..., :2] - tk) / scale) ** 2, axis=(-1, -2))
        kpt_loss = jnp.sum(jnp.where(pos, err, 0.0)) / n_pos
        total = total + kpt_weight * kpt_loss
        aux["kpt_loss"] = kpt_loss
    return total, aux


class DetectorTrainer:
    """Minimal jitted training driver for the person detector.

    mesh_config enables data-parallel training: params/opt state replicated,
    image/GT batches sharded over the mesh's batch axis; gradient all-reduce
    is emitted by XLA from the sharding annotations (no explicit psum)."""

    def __init__(self, model: PersonDetector, lr: float = 1e-3, seed: int = 0,
                 obj_pos_weight: float = 3.0, kpt_weight: float = 0.05,
                 mesh_config=None, total_steps: int = 0, warmup_steps: int = 0,
                 ema_decay: float = 0.0):
        self.obj_pos_weight = float(obj_pos_weight)
        self.kpt_weight = float(kpt_weight)
        self.model = model
        self.mesh_config = mesh_config
        self.ema_decay = float(ema_decay)
        self.variables = model.init_variables(jax.random.PRNGKey(seed))
        centers, strides = anchor_centers(model.img_size)
        self._centers = jnp.asarray(centers)
        self._strides = jnp.asarray(strides)
        if total_steps:
            # warmup + cosine decay to 1% — flat Adam never converges the
            # keypoint regression tightly; the tail LR is what cuts kpt RMS
            warmup = max(1, min(int(warmup_steps), int(total_steps) // 5))
            lr = optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup, int(total_steps), end_value=lr * 0.01)
        self.opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(lr))
        self.opt_state = self.opt.init(self.variables["params"])
        if mesh_config is not None:
            from cvsd_tpu.parallel.mesh import replicate

            self.variables = replicate(mesh_config.mesh, self.variables)
            self.opt_state = replicate(mesh_config.mesh, self.opt_state)
        # EMA of weights (YOLO-standard): stabilizes the box/keypoint heads;
        # eval with `ema_variables`. Ramped decay min(d, (1+t)/(10+t)).
        self.ema_params = jax.tree_util.tree_map(lambda x: x, self.variables["params"]) \
            if self.ema_decay > 0 else None
        self._ema_t = 0
        self._ema_step_fn = jax.jit(self._ema_update) if self.ema_decay > 0 else None
        self._step = jax.jit(self._make_step())

    @property
    def ema_variables(self):
        """Variables with EMA weights (falls back to raw when EMA is off)."""
        if self.ema_params is None:
            return self.variables
        return {"params": self.ema_params, "batch_stats": self.variables["batch_stats"]}

    def _ema_update(self, ema, params, t):
        d = jnp.minimum(self.ema_decay, (1.0 + t) / (10.0 + t))
        return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema, params)

    def _shard(self, tree):
        """Place batch arrays: sharded over the data axis under a mesh."""
        if self.mesh_config is None:
            return tree
        from cvsd_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh_config.mesh, tree,
                           batch_axis=self.mesh_config.batch_axis)

    def _make_step(self):
        model, opt = self.model, self.opt
        centers, strides = self._centers, self._strides
        size = model.img_size

        def step(params, batch_stats, opt_state, images, gt_boxes, gt_valid, gt_kpts):
            def loss_fn(p, bs):
                raw, updates = model.apply({"params": p, "batch_stats": bs}, images,
                                           train=True, mutable=["batch_stats"])
                loss, aux = detection_loss(
                    raw, gt_boxes, gt_valid, size, centers, strides,
                    gt_kpts=gt_kpts, num_keypoints=model.num_keypoints,
                    obj_pos_weight=self.obj_pos_weight, kpt_weight=self.kpt_weight,
                    head_variant=model.head_variant, num_classes=model.num_classes,
                    reg_max=model.reg_max,
                )
                return loss, (updates["batch_stats"], aux)

            (loss, (new_bs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats
            )
            updates, new_opt = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_bs, new_opt, loss, aux

        return step

    def train_steps_scan(self, images: np.ndarray, gt_boxes: np.ndarray, gt_valid: np.ndarray,
                         gt_kpts: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """Run N pre-batched steps in ONE device dispatch via lax.scan —
        amortizes host/relay round-trips (inputs have a leading steps axis:
        images (N, B, S, S, 3), gt_boxes (N, B, G, 4), ...). Returns per-step
        loss curves."""
        import jax

        model, opt = self.model, self.opt
        centers, strides, size = self._centers, self._strides, model.img_size
        pos_w, kpt_w = self.obj_pos_weight, self.kpt_weight
        if gt_kpts is None:
            gt_kpts = np.zeros((*gt_boxes.shape[:3], max(model.num_keypoints, 1), 2), np.float32)

        ema_decay = self.ema_decay

        def one(carry, batch):
            params, batch_stats, opt_state, ema, t = carry
            imgs, gb, gv, gk = batch

            def loss_fn(p, bs):
                raw, updates = model.apply({"params": p, "batch_stats": bs}, imgs,
                                           train=True, mutable=["batch_stats"])
                loss, aux = detection_loss(raw, gb, gv, size, centers, strides,
                                           gt_kpts=gk if model.num_keypoints else None,
                                           num_keypoints=model.num_keypoints,
                                           obj_pos_weight=pos_w, kpt_weight=kpt_w,
                                           head_variant=model.head_variant,
                                           num_classes=model.num_classes,
                                           reg_max=model.reg_max)
                return loss, (updates["batch_stats"], aux)

            (loss, (new_bs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats)
            updates, new_opt = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if ema_decay > 0:
                ema = self._ema_update(ema, new_params, t)
            return (new_params, new_bs, new_opt, ema, t + 1.0), loss

        @jax.jit
        def run(params, batch_stats, opt_state, ema, t0, images, gt_boxes, gt_valid, gt_kpts):
            (p, bs, os_, ema, t), losses = jax.lax.scan(
                one, (params, batch_stats, opt_state, ema, t0),
                (images, gt_boxes, gt_valid, gt_kpts)
            )
            return p, bs, os_, ema, t, losses

        batch = (np.asarray(images, np.float32), np.asarray(gt_boxes, np.float32),
                 np.asarray(gt_valid), np.asarray(gt_kpts, np.float32))
        if self.mesh_config is not None:
            # leading dim is the SCAN axis; shard the per-batch dim (1) over data
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            mesh, axis = self.mesh_config.mesh, self.mesh_config.batch_axis
            batch = tuple(
                jax.device_put(x, NamedSharding(mesh, P(None, axis, *([None] * (x.ndim - 2)))))
                for x in batch
            )
        else:
            batch = tuple(jnp.asarray(x) for x in batch)
        ema_in = self.ema_params if self.ema_params is not None else self.variables["params"]
        p, bs, self.opt_state, ema, t, losses = run(
            self.variables["params"], self.variables["batch_stats"], self.opt_state,
            ema_in, jnp.float32(self._ema_t), *batch,
        )
        losses = np.asarray(jax.device_get(losses))
        self.variables = {"params": jax.device_get(p), "batch_stats": jax.device_get(bs)}
        if self.ema_params is not None:
            self.ema_params = jax.device_get(ema)
            self._ema_t += losses.shape[0]
        return {"losses": losses}

    def save(self, path: str, config=None, use_ema: bool = True, **metadata) -> None:
        """Persist detector variables (EMA weights by default when enabled)
        with the architecture config embedded, loadable by
        models.detector.load_detector_checkpoint and the stream/preprocess
        CLIs' --detector_checkpoint."""
        from cvsd_tpu.utils.checkpoint import save_checkpoint

        m = self.model
        det_cfg = {
            "img_size": m.img_size, "width_mult": m.width_mult,
            "depth_mult": m.depth_mult, "pose_head": bool(m.num_keypoints),
            "num_keypoints": m.num_keypoints,
            "head_variant": m.head_variant, "num_classes": m.num_classes,
            "reg_max": m.reg_max, "dtype": str(m.dtype.__name__ if hasattr(m.dtype, "__name__")
                                               else m.dtype),
        }
        variables = self.ema_variables if use_ema else self.variables
        save_checkpoint(path, jax.device_get(variables),
                        config={**(config or {}), "detector": det_cfg}, **metadata)

    def train_step(self, images: np.ndarray, gt_boxes: np.ndarray, gt_valid: np.ndarray,
                   gt_kpts: Optional[np.ndarray] = None) -> Dict[str, float]:
        p, bs = self.variables["params"], self.variables["batch_stats"]
        if self.model.num_keypoints and gt_kpts is None:
            gt_kpts = np.zeros((*gt_boxes.shape[:2], self.model.num_keypoints, 2), np.float32)
        batch = self._shard({
            "images": images, "gt_boxes": gt_boxes, "gt_valid": gt_valid,
            **({"gt_kpts": gt_kpts} if self.model.num_keypoints else {}),
        })
        p, bs, self.opt_state, loss, aux = self._step(
            p, bs, self.opt_state, batch["images"], batch["gt_boxes"],
            batch["gt_valid"], batch.get("gt_kpts"),
        )
        self.variables = {"params": p, "batch_stats": bs}
        if self.ema_params is not None:
            self.ema_params = self._ema_step_fn(
                self.ema_params, p, jnp.float32(self._ema_t))
            self._ema_t += 1
        return {"loss": float(loss), **{k: float(v) for k, v in aux.items()}}


def synthetic_detection_batch(
    rng: np.random.Generator, batch: int, img_size: int, max_gt: int = 4,
    num_keypoints: int = 0,
) -> Tuple[np.ndarray, ...]:
    """Bright rectangles on dark noise + their boxes — the detector-training
    fixture (companion of data/video.py's write_test_video). With
    num_keypoints > 0 also returns (B, max_gt, K, 2) keypoints laid out on a
    fixed grid inside each box (pose-head fixture)."""
    images = rng.uniform(0, 0.25, (batch, img_size, img_size, 3)).astype(np.float32)
    boxes = np.zeros((batch, max_gt, 4), np.float32)
    valid = np.zeros((batch, max_gt), bool)
    kpts = np.zeros((batch, max_gt, num_keypoints, 2), np.float32) if num_keypoints else None
    fracs = np.linspace(0.15, 0.85, max(num_keypoints, 1))
    for b in range(batch):
        for g in range(rng.integers(1, max_gt + 1)):
            w = rng.integers(img_size // 8, img_size // 3)
            h = rng.integers(img_size // 8, img_size // 3)
            x1 = rng.integers(0, img_size - w)
            y1 = rng.integers(0, img_size - h)
            images[b, y1 : y1 + h, x1 : x1 + w] = rng.uniform(0.7, 1.0, 3)
            boxes[b, g] = (x1, y1, x1 + w, y1 + h)
            valid[b, g] = True
            if num_keypoints:
                kpts[b, g, :, 0] = x1 + fracs * w
                kpts[b, g, :, 1] = y1 + fracs[::-1] * h
    if num_keypoints:
        return images, boxes, valid, kpts
    return images, boxes, valid

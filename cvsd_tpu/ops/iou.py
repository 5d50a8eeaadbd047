"""Box geometry: format conversions and batched IoU (pure JAX, static shapes).

The reference gets these from ultralytics/torchvision native code
(/root/reference/model.py:38 model.track -> YOLO NMS; box.xywhn at
model.py:56-67). Here they are jittable primitives shared by the detector's
NMS, the tracker's association, and tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2), any leading dims."""
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xyxy_to_xywhn(b: jnp.ndarray, img_w: float, img_h: float) -> jnp.ndarray:
    """xyxy pixels -> normalized (cx, cy, w, h) — the reference CSV's box format
    (ultralytics box.xywhn, /root/reference/model.py:56-67)."""
    xywh = xyxy_to_xywh(b)
    scale = jnp.asarray([img_w, img_h, img_w, img_h], b.dtype)
    return xywh / scale


def box_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (..., N, 4) and (..., M, 4) xyxy boxes -> (..., N, M)."""
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)

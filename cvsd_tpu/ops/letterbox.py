"""Fused letterbox + normalize preprocessing (batched, on-device).

The reference's per-frame loop hands raw BGR frames to ultralytics, which
letterboxes/normalizes each frame on host per call
(/root/reference/preprocess.py:37-51 -> model.py:38). Here whole frame
batches are letterboxed on the TPU inside the same jitted program as the
detector: aspect-preserving resize to the target square, gray padding, and
uint8 -> [0,1] compute-dtype conversion, all fused by XLA (the resize lowers
to gathers/convs; the scale/pad geometry is static per source resolution so
nothing is data-dependent).

A hand-written Pallas letterbox was tried in round 1 and removed in round 2:
the NHWC frame layout puts C=3 on the 128-lane dimension, so any per-image
block tiles at <3% lane occupancy and Mosaic compiles the big blocks
pathologically; meanwhile the whole letterbox is ~1-2 ms of a 50-90 ms
detect program that XLA already fuses. The Pallas budget is spent where it
wins instead (ops/nms.py fixpoint kernel, the production default).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

PAD_VALUE = 114  # ultralytics' gray padding


def letterbox_params(src_h: int, src_w: int, size: int) -> Tuple[float, int, int, int, int]:
    """Static letterbox geometry: (scale, pad_x, pad_y, new_w, new_h)."""
    scale = min(size / src_h, size / src_w)
    new_w, new_h = int(round(src_w * scale)), int(round(src_h * scale))
    pad_x = (size - new_w) // 2
    pad_y = (size - new_h) // 2
    return scale, pad_x, pad_y, new_w, new_h


@functools.partial(jax.jit, static_argnames=("size", "dtype"))
def letterbox_batch(
    frames: jnp.ndarray,  # (B, H, W, 3) uint8 (RGB)
    size: int = 640,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, size, size, 3) dtype in [0, 1], letterboxed."""
    B, H, W, C = frames.shape
    scale, pad_x, pad_y, new_w, new_h = letterbox_params(H, W, size)
    # resize in f32 (bf16 resize hits a pathological lowering on current
    # XLA:TPU — compiles for minutes); cast to the compute dtype after
    x = frames.astype(jnp.float32)
    x = jax.image.resize(x, (B, new_h, new_w, C), method="linear")
    x = jnp.pad(
        x,
        ((0, 0), (pad_y, size - new_h - pad_y), (pad_x, size - new_w - pad_x), (0, 0)),
        constant_values=float(PAD_VALUE),
    )
    return (x * (1.0 / 255.0)).astype(dtype)


def unletterbox_boxes(
    boxes_xyxy: jnp.ndarray, src_h: int, src_w: int, size: int
) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed coords back to source-frame pixels."""
    scale, pad_x, pad_y, _, _ = letterbox_params(src_h, src_w, size)
    shift = jnp.asarray([pad_x, pad_y, pad_x, pad_y], boxes_xyxy.dtype)
    out = (boxes_xyxy - shift) / scale
    lim = jnp.asarray([src_w, src_h, src_w, src_h], boxes_xyxy.dtype)
    return jnp.clip(out, 0, lim)

"""Fused letterbox + normalize preprocessing (batched, on-device).

The reference's per-frame loop hands raw BGR frames to ultralytics, which
letterboxes/normalizes each frame on host per call
(/root/reference/preprocess.py:37-51 -> model.py:38). Here whole frame
batches are letterboxed on the TPU inside the same jitted program as the
detector: aspect-preserving resize to the target square, gray padding, and
uint8 -> [0,1] compute-dtype conversion, all fused by XLA (the resize lowers
to gathers/convs; the scale/pad geometry is static per source resolution so
nothing is data-dependent).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _letterbox_int_kernel(frames_ref, out_ref, *, k: int, pad_x: int, pad_y: int,
                          size: int, new_h: int, new_w: int, dtype):
    """Fused uint8 -> [0,1] dtype letterbox for integer upscale factor k.
    One (batch, channel) plane per grid step: load (H, W) uint8, normalize,
    k-x replicate along both axes (pltpu.repeat), write into the padded
    canvas. No f32 intermediate, no gather — pure VPU + layout ops."""
    # Mosaic has no direct uint8->f32 cast; hop through int32
    x = frames_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)  # (H, W, C)
    if k > 1:
        # element-wise k-x replication (pltpu.repeat tiles whole arrays, so
        # use jnp.repeat -> broadcast+reshape, which Mosaic lowers natively)
        x = jnp.repeat(jnp.repeat(x, k, axis=0), k, axis=1)
    C = x.shape[-1]
    out_ref[0] = jnp.full((size, size, C), PAD_VALUE / 255.0, jnp.float32).astype(dtype)
    out_ref[0, pad_y : pad_y + new_h, pad_x : pad_x + new_w, :] = x.astype(dtype)


def letterbox_batch_pallas(
    frames: jnp.ndarray,  # (B, H, W, 3) uint8
    size: int = 640,
    dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas letterbox for sources whose fit scale is an exact integer
    (e.g. 320x240 -> 640: k=2). Nearest-neighbor replication — for k-x
    upscale of 8-bit video this is visually identical to bilinear at the
    detector's scale. Falls back to `letterbox_batch` for non-integer scales.

    EXPERIMENTAL: validated in interpret mode; on current Mosaic the big
    (H, W, C)-block layout compiles pathologically slowly, so the default
    pipeline uses the XLA letterbox (which fuses fine) until that's fixed.
    """
    B, H, W, C = frames.shape
    scale, pad_x, pad_y, new_w, new_h = letterbox_params(H, W, size)
    k = int(round(scale))
    if abs(scale - k) > 1e-9 or k < 1:
        return letterbox_batch(frames, size=size, dtype=dtype)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _letterbox_int_kernel, k=k, pad_x=pad_x, pad_y=pad_y,
        size=size, new_h=new_h, new_w=new_w, dtype=dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, size, size, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, size, size, C), dtype),
        interpret=interpret,
    )(frames)


def unletterbox_boxes(
    boxes_xyxy: jnp.ndarray, src_h: int, src_w: int, size: int
) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed coords back to source-frame pixels."""
    scale, pad_x, pad_y, _, _ = letterbox_params(src_h, src_w, size)
    shift = jnp.asarray([pad_x, pad_y, pad_x, pad_y], boxes_xyxy.dtype)
    out = (boxes_xyxy - shift) / scale
    lim = jnp.asarray([src_w, src_h, src_w, src_h], boxes_xyxy.dtype)
    return jnp.clip(out, 0, lim)

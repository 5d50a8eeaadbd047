"""Non-maximum suppression on TPU — static shapes, Pallas kernel + JAX reference.

The reference relies on ultralytics/torchvision CUDA NMS inside
``model.track`` (/root/reference/model.py:38). Data-dependent box counts
fight XLA's static shapes, so the TPU design is:

1. confidence mask + per-image top-K candidate prefilter (lax.top_k — sorted
   by score, static K)
2. greedy suppression over the fixed K*K IoU matrix. Production path:
   `nms_pallas_fixpoint` — a fused Pallas kernel that builds the suppression
   adjacency in VMEM and runs a Jacobi fixpoint iteration (exactly equal to
   greedy NMS; see nms_fixpoint_jax) with no HBM round-trips. Measured on
   v5e at B=64, K=256, full postprocess: pallas_fixpoint 1.63 ms,
   vmapped-XLA sequential 1.95 ms, XLA fixpoint 2.39 ms, per-image
   sequential Pallas 3.15 ms. Legacy sequential variants retained for
   reference/testing.
3. fixed max_detections output with a validity mask

Everything is batched over images; no host synchronization anywhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvsd_tpu.ops.iou import box_iou_matrix


def _suppress(iou: jnp.ndarray, init_alive: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """Greedy suppression over score-desc-sorted candidates.
    iou: (..., K, K); init_alive: (..., K) bool. Returns alive mask."""
    K = iou.shape[-1]
    cols = jnp.arange(K)

    def body(i, alive):
        row = jnp.take(iou, i, axis=-2)  # (..., K)
        anchor_alive = jnp.take(alive, i, axis=-1)[..., None]
        suppress = (row > iou_thresh) & (cols > i) & anchor_alive
        return alive & ~suppress

    return jax.lax.fori_loop(0, K, body, init_alive)


def nms_jax(
    boxes: jnp.ndarray,  # (K, 4) xyxy, sorted by descending score
    scores: jnp.ndarray,  # (K,)
    iou_thresh: float = 0.45,
    conf_thresh: float = 0.0,
) -> jnp.ndarray:
    """Reference greedy NMS -> keep mask (K,) bool."""
    iou = box_iou_matrix(boxes, boxes)
    alive = scores >= conf_thresh
    return _suppress(iou, alive, iou_thresh)


def _nms_kernel(boxes_ref, alive_ref, keep_ref, iou_scratch, alive_scratch, *, iou_thresh: float):
    """Per-image fused kernel: IoU matrix + suppression loop, all in VMEM.
    boxes_ref: (1, K, 4); alive_ref/keep_ref: (1, 1, K) (TPU tile alignment).
    The IoU matrix and alive mask live in VMEM scratch so the suppression
    loop indexes them with pl.ds (Mosaic has no dynamic_slice on values)."""
    b = boxes_ref[0]  # (K, 4)
    K = b.shape[0]
    x1, y1, x2, y2 = b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4]  # (K, 1)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    # pairwise intersections via (K,1) x (1,K) broadcasts on the VPU
    ix = jnp.maximum(jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0)
    iy = jnp.maximum(jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0)
    inter = ix * iy
    union = area + area.T - inter
    iou_scratch[:] = inter / jnp.maximum(union, 1e-9)  # (K, K)
    alive_scratch[:] = alive_ref[0]

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def body(i, _):
        row = iou_scratch[pl.ds(i, 1), :]  # (1, K) — sublane-dynamic is supported
        alive = alive_scratch[:]
        # anchor alive flag via one-hot reduction (lane-dynamic loads are not
        # supported by Mosaic)
        anchor = jnp.sum(jnp.where(cols == i, alive, 0.0), axis=1, keepdims=True)  # (1, 1)
        suppress = (row > iou_thresh) & (cols > i) & (anchor > 0.5)
        alive_scratch[:] = jnp.where(suppress, 0.0, alive)
        return 0

    jax.lax.fori_loop(0, K, body, 0)
    keep_ref[0] = alive_scratch[:]


def nms_pallas(
    boxes: jnp.ndarray,  # (B, K, 4) xyxy, sorted by descending score per image
    alive: jnp.ndarray,  # (B, K) float32 initial mask (conf-thresholded)
    iou_thresh: float = 0.45,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched greedy NMS -> keep mask (B, K) float32. Grid over images; each
    grid step holds one image's K candidates in VMEM."""
    B, K, _ = boxes.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_nms_kernel, iou_thresh=iou_thresh)
    keep = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, K), jnp.float32),
            pltpu.VMEM((1, K), jnp.float32),
        ],
        interpret=interpret,
    )(boxes.astype(jnp.float32), alive.astype(jnp.float32).reshape(B, 1, K))
    return keep.reshape(B, K)


def _nms_kernel_multi(boxes_ref, alive_ref, keep_ref, iou_scratch, alive_scratch,
                      *, iou_thresh: float, G: int):
    """G images per grid step: IoU tensor (G, K, K) in VMEM, suppression loop
    vectorized across the G images (each fori iteration touches G rows)."""
    b = boxes_ref[:]  # (G, K, 4)
    K = b.shape[1]
    x1, y1, x2, y2 = b[:, :, 0:1], b[:, :, 1:2], b[:, :, 2:3], b[:, :, 3:4]  # (G, K, 1)
    x1t = jnp.swapaxes(x1, 1, 2)  # (G, 1, K)
    y1t = jnp.swapaxes(y1, 1, 2)
    x2t = jnp.swapaxes(x2, 1, 2)
    y2t = jnp.swapaxes(y2, 1, 2)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (G, K, 1)
    ix = jnp.maximum(jnp.minimum(x2, x2t) - jnp.maximum(x1, x1t), 0.0)  # (G, K, K)
    iy = jnp.maximum(jnp.minimum(y2, y2t) - jnp.maximum(y1, y1t), 0.0)
    inter = ix * iy
    union = area + jnp.swapaxes(area, 1, 2) - inter
    iou_scratch[:] = inter / jnp.maximum(union, 1e-9)
    alive_scratch[:] = alive_ref[:]  # (G, 1, K)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)

    def body(i, _):
        rows = iou_scratch[:, pl.ds(i, 1), :]  # (G, 1, K) sublane-dynamic
        alive = alive_scratch[:]
        anchor = jnp.sum(jnp.where(cols == i, alive, 0.0), axis=2, keepdims=True)  # (G, 1, 1)
        suppress = (rows > iou_thresh) & (cols > i) & (anchor > 0.5)
        alive_scratch[:] = jnp.where(suppress, 0.0, alive)
        return 0

    jax.lax.fori_loop(0, K, body, 0)
    keep_ref[:] = alive_scratch[:]


def nms_pallas_multi(
    boxes: jnp.ndarray,  # (B, K, 4) sorted desc per image
    alive: jnp.ndarray,  # (B, K)
    iou_thresh: float = 0.45,
    group: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Grouped Pallas NMS: each grid step suppresses `group` images at once
    (VMEM budget: group*K*K*4 bytes for the IoU tensor — 2 MB at G=8, K=256;
    G=32 exceeds the 16 MB scoped-vmem limit).

    Legacy: superseded by nms_pallas_fixpoint, which replaces the K-step
    sequential suppression loop with a Jacobi fixpoint that converges in
    ~6 iterations on real detection workloads (1.9x faster on v5e)."""
    B, K, _ = boxes.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    G = group
    pad = (-B) % G
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0), (0, 0)))
        alive = jnp.pad(alive, ((0, pad), (0, 0)))
    Bp = B + pad
    kernel = functools.partial(_nms_kernel_multi, iou_thresh=iou_thresh, G=G)
    keep = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, K, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, 1, K), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, 1, K), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, 1, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((G, K, K), jnp.float32),
            pltpu.VMEM((G, 1, K), jnp.float32),
        ],
        interpret=interpret,
    )(boxes.astype(jnp.float32), alive.astype(jnp.float32).reshape(Bp, 1, K))
    return keep.reshape(Bp, K)[:B]


def _strict_lower_mask(iou: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """M[..., i, j] = 1 where candidate i (higher score, i<j) overlaps j
    beyond the threshold — the suppression adjacency matrix."""
    K = iou.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return ((iou > iou_thresh) & (rows < cols)).astype(jnp.float32)


def nms_fixpoint_jax(
    boxes: jnp.ndarray,  # (B, K, 4) xyxy, sorted by descending score per image
    alive: jnp.ndarray,  # (B, K) bool/float initial mask (conf-thresholded)
    iou_thresh: float = 0.45,
) -> jnp.ndarray:
    """Greedy NMS via Jacobi fixpoint iteration -> keep mask (B, K) bool.

    Greedy suppression is the well-founded recursion
    ``alive[j] = init[j] & not any(M[i,j] & alive[i] for i < j)`` (dependencies
    strictly on higher-scored candidates). Jacobi iteration
    ``a_{k+1} = init & (M^T a_k == 0)`` converges to that unique fixpoint in at
    most max-suppression-chain-depth steps (typically 2-5 for real detections,
    bounded by K). Each step is ONE batched (B,1,K)x(B,K,K) matvec on the MXU
    instead of the K-step sequential fori_loop in ``_suppress`` — so the whole
    batch suppresses in a handful of matmuls.
    """
    B, K, _ = boxes.shape
    iou = box_iou_matrix(boxes, boxes)  # (B, K, K)
    M = _strict_lower_mask(iou, iou_thresh)  # (B, K, K)
    init = alive.astype(jnp.float32).reshape(B, 1, K)

    def cond(carry):
        _, changed, it = carry
        return changed & (it < K)

    def body(carry):
        a, _, it = carry
        # suppr[j] = sum_i M[i,j] * a[i]  — batched matvec
        suppr = jax.lax.dot_general(
            a, M, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (B, 1, K)
        new = init * (suppr < 0.5).astype(jnp.float32)
        changed = jnp.any(new != a)
        return new, changed, it + 1

    out, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return out.reshape(B, K) > 0.5


def _nms_fixpoint_kernel(boxes_ref, alive_ref, keep_ref, m_scratch, alive_scratch,
                         *, iou_thresh: float, K: int):
    """G images per grid step. Builds the suppression adjacency M (G, K, K) in
    VMEM once, then runs the Jacobi fixpoint entirely in VMEM — no HBM traffic
    for M between iterations (XLA's while_loop re-reads it from HBM each step).
    """
    b = boxes_ref[:]  # (G, K, 4)
    x1, y1, x2, y2 = b[:, :, 0:1], b[:, :, 1:2], b[:, :, 2:3], b[:, :, 3:4]  # (G, K, 1)
    x1t = jnp.swapaxes(x1, 1, 2)
    y1t = jnp.swapaxes(y1, 1, 2)
    x2t = jnp.swapaxes(x2, 1, 2)
    y2t = jnp.swapaxes(y2, 1, 2)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (G, K, 1)
    ix = jnp.maximum(jnp.minimum(x2, x2t) - jnp.maximum(x1, x1t), 0.0)  # (G, K, K)
    iy = jnp.maximum(jnp.minimum(y2, y2t) - jnp.maximum(y1, y1t), 0.0)
    inter = ix * iy
    union = area + jnp.swapaxes(area, 1, 2) - inter
    iou = inter / jnp.maximum(union, 1e-9)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 2)
    m_scratch[:] = ((iou > iou_thresh) & (rows < cols)).astype(jnp.float32)
    alive_scratch[:] = alive_ref[:]  # (G, 1, K) == init (Jacobi a_0)

    def cond(carry):
        changed, it = carry
        return changed & (it < K)

    def body(carry):
        _, it = carry
        a = alive_scratch[:]  # (G, 1, K)
        init = alive_ref[:]
        # suppr[g, 0, j] = sum_i M[g, i, j] * a[g, 0, i] : broadcast-multiply
        # the alive column (G, K, 1) into M and reduce over the sublane dim
        # (Mosaic-friendly; avoids batched dot_general inside the kernel).
        suppr = jnp.sum(m_scratch[:] * jnp.swapaxes(a, 1, 2), axis=1, keepdims=True)
        new = init * (suppr < 0.5).astype(jnp.float32)
        changed = jnp.sum(jnp.abs(new - a)) > 0.0
        alive_scratch[:] = new
        return changed, it + 1

    jax.lax.while_loop(cond, body, (jnp.bool_(True), 0))
    keep_ref[:] = alive_scratch[:]


def nms_pallas_fixpoint(
    boxes: jnp.ndarray,  # (B, K, 4) sorted desc per image
    alive: jnp.ndarray,  # (B, K)
    iou_thresh: float = 0.45,
    group: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused Pallas greedy NMS via the Jacobi fixpoint (see nms_fixpoint_jax).
    Keeps the (G, K, K) suppression matrix resident in VMEM across iterations.
    VMEM: G*K*K*4 bytes — 2 MB at G=8, K=256."""
    B, K, _ = boxes.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    G = group
    pad = (-B) % G
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0), (0, 0)))
        alive = jnp.pad(alive, ((0, pad), (0, 0)))
    Bp = B + pad
    kernel = functools.partial(_nms_fixpoint_kernel, iou_thresh=iou_thresh, K=K)
    keep = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, K, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, 1, K), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, 1, K), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, 1, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((G, K, K), jnp.float32),
            pltpu.VMEM((G, 1, K), jnp.float32),
        ],
        interpret=interpret,
    )(boxes.astype(jnp.float32), alive.astype(jnp.float32).reshape(Bp, 1, K))
    return keep.reshape(Bp, K)[:B] > 0.5


def batched_nms(
    boxes: jnp.ndarray,  # (B, A, 4) xyxy
    scores: jnp.ndarray,  # (B, A)
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_detections: int = 128,
    pre_topk: int = 256,
    use_pallas: bool | None = None,
    method: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full detection postprocess: conf mask -> top-K prefilter -> greedy NMS ->
    fixed-size (boxes, scores, valid, anchor_idx) outputs.

    method: 'pallas_fixpoint' (default — fused VMEM Jacobi kernel),
            'fixpoint' (XLA Jacobi matvec loop),
            'pallas_seq' (per-image sequential kernel, legacy),
            'xla' (vmapped sequential fori_loop, legacy reference).
    All four compute the exact same greedy-NMS keep mask. `use_pallas` is the
    legacy bool alias (True -> pallas_fixpoint, False -> xla).

    Returns: boxes (B, max_detections, 4), scores (B, max_detections),
             valid (B, max_detections) bool, anchor_idx (B, max_detections)
             int32 indices into the original A anchors (0 where invalid).
    """
    if method is None:
        if use_pallas is None:
            method = "pallas_fixpoint"
        else:
            method = "pallas_fixpoint" if use_pallas else "xla"
    B, A, _ = boxes.shape
    K = min(pre_topk, A)
    masked = jnp.where(scores >= conf_thresh, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, K)  # sorted desc
    cand_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)  # (B, K, 4)
    init_alive = jnp.isfinite(top_scores)

    if method == "pallas_fixpoint":
        keep = nms_pallas_fixpoint(cand_boxes, init_alive.astype(jnp.float32), iou_thresh)
    elif method == "fixpoint":
        keep = nms_fixpoint_jax(cand_boxes, init_alive, iou_thresh)
    elif method == "pallas_seq":
        keep = nms_pallas(cand_boxes, init_alive.astype(jnp.float32), iou_thresh) > 0.5
    elif method == "xla":
        keep = jax.vmap(lambda b, a: _suppress(box_iou_matrix(b, b), a, iou_thresh))(
            cand_boxes, init_alive
        )
    else:
        raise ValueError(f"unknown NMS method: {method!r}")

    final_scores = jnp.where(keep & init_alive, top_scores, -jnp.inf)
    M = min(max_detections, K)
    out_scores, out_idx = jax.lax.top_k(final_scores, M)
    out_boxes = jnp.take_along_axis(cand_boxes, out_idx[..., None], axis=1)
    anchor_idx = jnp.take_along_axis(top_idx, out_idx, axis=1)
    valid = jnp.isfinite(out_scores)
    out_scores = jnp.where(valid, out_scores, 0.0)
    out_boxes = jnp.where(valid[..., None], out_boxes, 0.0)
    anchor_idx = jnp.where(valid, anchor_idx, 0).astype(jnp.int32)
    if M < max_detections:
        pad = max_detections - M
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
        anchor_idx = jnp.pad(anchor_idx, ((0, 0), (0, pad)))
    return out_boxes, out_scores, valid, anchor_idx

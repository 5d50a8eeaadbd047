"""Serialized serving artifacts via jax.export (StableHLO).

The ultralytics deployment story is `yolo export` (ONNX/TensorRT engines,
/root/reference's detector ships as a ready .pt consumed at model.py:18);
the TPU-native equivalent is a serialized StableHLO module: the WHOLE fused
serving program (letterbox -> bf16 backbone -> decode -> NMS, or the
Shopformer scoring forward) with the trained weights baked in as constants,
exported once and runnable from any PJRT runtime (Python via
jax.export.deserialize, or C++/serving infra) without the model class, the
framework, or Python-side config.

Batch size is exported SYMBOLICALLY (jax.export symbolic shapes), so one
artifact serves any batch size; spatial dims stay static (XLA-optimal).

NMS note: the exported detector uses the pure-XLA NMS formulation rather
than the Pallas kernel — identical outputs (ops/nms.py equivalence tests),
but custom-call-free StableHLO is portable across PJRT backends/versions.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jex


def export_detector(
    model,
    variables,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_detections: int = 128,
    platforms: Optional[Sequence[str]] = None,
    tta_flip: bool = False,
) -> jex.Exported:
    """Export the fused detect program with weights baked in.

    Signature of the exported module: images (b, S, S, 3) f32 [0,1] ->
    (boxes (b, M, 4) xyxy canvas px, scores (b, M), valid (b, M)[, kpts]).
    `b` is symbolic (any batch size at call time).
    """
    from cvsd_tpu.models.detector import make_detect_fn

    detect = make_detect_fn(model, conf_thresh=conf_thresh,
                            iou_thresh=iou_thresh,
                            max_detections=max_detections,
                            nms_method="xla", tta_flip=tta_flip)
    frozen = jax.tree.map(jnp.asarray, variables)

    def serving(images):
        return detect(frozen, images)

    S = int(model.img_size)
    (b,) = jex.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, S, S, 3), jnp.float32)
    return jex.export(jax.jit(serving), platforms=_platforms(platforms))(spec)


def export_scorer(
    scorer,
    platforms: Optional[Sequence[str]] = None,
) -> jex.Exported:
    """Export the Shopformer anomaly-scoring forward with weights baked in.

    Signature: poses (b, T, V, C) f32 (normalized windows, the data layer's
    output) -> scores (b,).
    """
    frozen = jax.tree.map(jnp.asarray, scorer.variables)

    def serving(poses):
        return scorer._score(frozen, poses)

    m = scorer.config["model"]
    T = int(m.get("seq_len", 12))
    V = int(m.get("num_keypoints", 18))
    C = int(m.get("in_channels", 2))
    (b,) = jex.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, T, V, C), jnp.float32)
    return jex.export(jax.jit(serving), platforms=_platforms(platforms))(spec)


def _platforms(platforms: Optional[Sequence[str]]) -> Sequence[str]:
    if platforms:
        return tuple(platforms)
    # default: current backend plus tpu, so an artifact exported during
    # CPU-side CI still loads on the serving chips
    cur = jax.default_backend()
    return (cur,) if cur == "tpu" else (cur, "tpu")


def save_exported(exported: jex.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str) -> jex.Exported:
    with open(path, "rb") as f:
        return jex.deserialize(bytearray(f.read()))


def call_exported(exported: jex.Exported, *args) -> Any:
    """Convenience: invoke a (de)serialized artifact on the current backend."""
    return exported.call(*[jnp.asarray(a) for a in args])

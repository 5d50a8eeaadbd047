"""Ultralytics yolov5*u checkpoint import -> PersonDetector(head_variant='v8dfl').

The reference gets person detection from a pretrained ultralytics checkpoint
(/root/reference/model.py:18 loads ./models/yolov5mu.pt). This repo's
PersonDetector deliberately shares the v5 backbone/PAN topology (6x6 stem,
C3 blocks at depths [2,4,6,2], SPPF, v5 neck) and — with
head_variant='v8dfl' — the u-series anchor-free DFL head, so real
ultralytics weights drop straight in where available:

    variables = import_yolov5u(load_torch_checkpoint("yolov5mu.pt"))
    detect = make_detect_fn(PersonDetector(head_variant="v8dfl"), ...)

The mapping is purely structural (torch NCHW Conv2d -> flax HWIO kernels,
BN weight/bias/running stats -> scale/bias/batch_stats); no ultralytics code
is required or used. `synthesize_state_dict` builds a shape-correct fake
checkpoint for tests, and tests/test_yolo_import.py validates numerics
against an independent torch mirror of the ultralytics forward pass.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

FlaxPath = Tuple[str, ...]


def _to_numpy(t: Any) -> np.ndarray:
    """Accept torch tensors or numpy arrays."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_entries(tp: str, fp: FlaxPath) -> List[Tuple[str, str, FlaxPath, str]]:
    """Mapping rows for one ultralytics Conv (conv+bn+silu) block.
    Row = (torch_key, kind, flax_subpath, collection)."""
    return [
        (f"{tp}.conv.weight", "conv_kernel", fp + ("Conv_0", "kernel"), "params"),
        (f"{tp}.bn.weight", "copy", fp + ("BatchNorm_0", "scale"), "params"),
        (f"{tp}.bn.bias", "copy", fp + ("BatchNorm_0", "bias"), "params"),
        (f"{tp}.bn.running_mean", "copy", fp + ("BatchNorm_0", "mean"), "batch_stats"),
        (f"{tp}.bn.running_var", "copy", fp + ("BatchNorm_0", "var"), "batch_stats"),
    ]


def _c3_entries(tp: str, fp: FlaxPath, n: int) -> List[Tuple[str, str, FlaxPath, str]]:
    rows = []
    rows += _conv_entries(f"{tp}.cv1", fp + ("ConvBNAct_0",))
    rows += _conv_entries(f"{tp}.cv2", fp + ("ConvBNAct_1",))
    rows += _conv_entries(f"{tp}.cv3", fp + ("ConvBNAct_2",))
    for i in range(n):
        rows += _conv_entries(f"{tp}.m.{i}.cv1", fp + (f"Bottleneck_{i}", "ConvBNAct_0"))
        rows += _conv_entries(f"{tp}.m.{i}.cv2", fp + (f"Bottleneck_{i}", "ConvBNAct_1"))
    return rows


def build_key_map(depth_mult: float = 0.67) -> List[Tuple[str, str, FlaxPath, str]]:
    """Full torch-state-dict -> flax-tree mapping for a yolov5<x>u checkpoint.
    Layer indices follow the v5 yaml (backbone 0-9, neck 10-23, Detect 24)."""
    d = lambda n: max(1, round(n * depth_mult))  # noqa: E731
    B: FlaxPath = ("Backbone_0",)
    N: FlaxPath = ("PANNeck_0",)
    rows: List[Tuple[str, str, FlaxPath, str]] = []
    rows += _conv_entries("model.0", B + ("ConvBNAct_0",))
    rows += _conv_entries("model.1", B + ("ConvBNAct_1",))
    rows += _c3_entries("model.2", B + ("C3_0",), d(3))
    rows += _conv_entries("model.3", B + ("ConvBNAct_2",))
    rows += _c3_entries("model.4", B + ("C3_1",), d(6))
    rows += _conv_entries("model.5", B + ("ConvBNAct_3",))
    rows += _c3_entries("model.6", B + ("C3_2",), d(9))
    rows += _conv_entries("model.7", B + ("ConvBNAct_4",))
    rows += _c3_entries("model.8", B + ("C3_3",), d(3))
    rows += _conv_entries("model.9.cv1", B + ("SPPF_0", "ConvBNAct_0"))
    rows += _conv_entries("model.9.cv2", B + ("SPPF_0", "ConvBNAct_1"))
    rows += _conv_entries("model.10", N + ("ConvBNAct_0",))
    rows += _c3_entries("model.13", N + ("C3_0",), d(3))
    rows += _conv_entries("model.14", N + ("ConvBNAct_1",))
    rows += _c3_entries("model.17", N + ("C3_1",), d(3))
    rows += _conv_entries("model.18", N + ("ConvBNAct_2",))
    rows += _c3_entries("model.20", N + ("C3_2",), d(3))
    rows += _conv_entries("model.21", N + ("ConvBNAct_3",))
    rows += _c3_entries("model.23", N + ("C3_3",), d(3))
    for lvl in range(3):
        H: FlaxPath = (f"V8DFLHead_{lvl}",)
        rows += _conv_entries(f"model.24.cv2.{lvl}.0", H + ("ConvBNAct_0",))
        rows += _conv_entries(f"model.24.cv2.{lvl}.1", H + ("ConvBNAct_1",))
        rows.append((f"model.24.cv2.{lvl}.2.weight", "conv_kernel", H + ("Conv_0", "kernel"), "params"))
        rows.append((f"model.24.cv2.{lvl}.2.bias", "copy", H + ("Conv_0", "bias"), "params"))
        rows += _conv_entries(f"model.24.cv3.{lvl}.0", H + ("ConvBNAct_2",))
        rows += _conv_entries(f"model.24.cv3.{lvl}.1", H + ("ConvBNAct_3",))
        rows.append((f"model.24.cv3.{lvl}.2.weight", "conv_kernel", H + ("Conv_1", "kernel"), "params"))
        rows.append((f"model.24.cv3.{lvl}.2.bias", "copy", H + ("Conv_1", "bias"), "params"))
    return rows


def _get(tree: Dict[str, Any], path: FlaxPath):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set(tree: Dict[str, Any], path: FlaxPath, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def import_yolov5u(
    state_dict: Dict[str, Any],
    model: Optional[Any] = None,
    variables: Optional[Any] = None,
    strict: bool = True,
) -> Any:
    """Map an ultralytics yolov5*u torch state dict onto PersonDetector
    variables (head_variant='v8dfl'). Params not covered by the checkpoint
    (e.g. an enabled keypoint branch — ultralytics detection models have
    none) keep their initialized values.

    Returns {'params': ..., 'batch_stats': ...} ready for model.apply.
    """
    import jax
    import jax.numpy as jnp

    from cvsd_tpu.models.detector import PersonDetector

    if model is None:
        model = PersonDetector(head_variant="v8dfl")
    if model.head_variant != "v8dfl":
        raise ValueError("yolov5u import requires head_variant='v8dfl'")
    if variables is None:
        variables = model.init_variables(jax.random.PRNGKey(0))
    # strip common prefixes: DetectionModel checkpoints may expose
    # 'model.model.N...' when nested, plain exports use 'model.N...'
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model.model."):
            k = k[len("model."):]
        sd[k] = v

    tree = jax.tree_util.tree_map(np.asarray, jax.device_get(
        {"params": dict(variables["params"]), "batch_stats": dict(variables["batch_stats"])}
    ))
    # flax FrozenDict/immutability: rebuild as plain nested dicts
    import flax

    tree = flax.core.unfreeze(flax.core.freeze(tree))

    dfl_w = sd.get("model.24.dfl.conv.weight")
    if dfl_w is not None:
        expected = np.arange(model.reg_max, dtype=np.float32)
        got = _to_numpy(dfl_w).reshape(-1)
        if not np.allclose(got, expected):
            raise ValueError("DFL conv weight is not arange(reg_max); unsupported head")

    missing, applied = [], 0
    for torch_key, kind, fpath, coll in build_key_map(model.depth_mult):
        if torch_key not in sd:
            missing.append(torch_key)
            continue
        w = _to_numpy(sd[torch_key])
        if kind == "conv_kernel":
            w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        target = _get(tree[coll], fpath)
        if tuple(target.shape) != tuple(w.shape):
            raise ValueError(
                f"shape mismatch for {torch_key} -> {'/'.join(fpath)}: "
                f"checkpoint {w.shape} vs model {tuple(target.shape)}"
            )
        _set(tree[coll], fpath, w.astype(np.float32))
        applied += 1
    if strict and missing:
        raise KeyError(f"checkpoint is missing {len(missing)} keys, e.g. {missing[:5]}")
    return jax.tree_util.tree_map(jnp.asarray, tree)


def synthesize_state_dict(
    depth_mult: float = 0.67, width_mult: float = 0.75,
    num_classes: int = 80, reg_max: int = 16, seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Build a random state dict with exactly the keys/shapes of a real
    yolov5<x>u checkpoint (for tests; also documents the expected layout)."""
    import jax

    from cvsd_tpu.models.detector import PersonDetector

    model = PersonDetector(width_mult=width_mult, depth_mult=depth_mult,
                           head_variant="v8dfl", num_classes=num_classes,
                           reg_max=reg_max, img_size=64)
    variables = model.init_variables(jax.random.PRNGKey(seed))
    tree = jax.device_get({"params": variables["params"],
                           "batch_stats": variables["batch_stats"]})
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for torch_key, kind, fpath, coll in build_key_map(depth_mult):
        target = np.asarray(_get(tree[coll], fpath))
        shape = target.shape
        if kind == "conv_kernel":
            shape = (shape[3], shape[2], shape[0], shape[1])  # HWIO -> OIHW
        if torch_key.endswith("running_var"):
            w = rng.uniform(0.5, 2.0, shape)
        elif torch_key.endswith("bn.weight"):
            w = rng.uniform(0.5, 1.5, shape)
        else:
            fan = max(1, int(np.prod(shape[1:])))
            w = rng.normal(0.0, 1.0 / math.sqrt(fan), shape)
        sd[torch_key] = w.astype(np.float32)
    sd["model.24.dfl.conv.weight"] = np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)
    return sd


def load_torch_checkpoint(path: str, allow_unsafe_load: bool = False) -> Dict[str, Any]:
    """Load a .pt checkpoint into a flat torch state dict. Handles plain
    state dicts, {'model': state_dict}, and objects exposing .state_dict()
    (unpickling a full ultralytics DetectionModel requires the ultralytics
    package; exporting its .state_dict() first avoids that dependency).

    allow_unsafe_load: full unpickling (needed when weights_only=True fails)
    executes arbitrary code from the file; it only runs with this explicit
    opt-in (cli.import_yolo: --unsafe), otherwise the safe failure is raised.
    """
    import torch

    try:
        # weights_only=True refuses to execute arbitrary pickle code — the
        # safe default for third-party downloads (plain state dicts load fine)
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_unsafe_load:
            raise ValueError(
                f"{path}: not loadable with weights_only=True. Full unpickling "
                "executes code embedded in the file; pass allow_unsafe_load="
                "True (--unsafe) only for checkpoints you trust.")
        import warnings

        warnings.warn(
            f"{path}: not loadable with weights_only=True; falling back to full "
            "unpickling, which EXECUTES code embedded in the file. Only do this "
            "for checkpoints you trust.", RuntimeWarning)
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        inner = obj.get("model", obj)
    else:
        inner = obj
    if hasattr(inner, "state_dict"):
        inner = inner.float().state_dict() if hasattr(inner, "float") else inner.state_dict()
    if not isinstance(inner, dict):
        raise TypeError(f"unsupported checkpoint object: {type(obj)}")
    return inner

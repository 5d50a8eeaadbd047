"""Shared CLI plumbing: config loading + dotted overrides + mesh selection."""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict

from cvsd_tpu.config import apply_overrides, get_default_config, load_config, validate_config

# Honor JAX_PLATFORMS for every CLI entry point. The environment's
# sitecustomize pre-registers a TPU backend, so the env var alone does not
# win — mirror it into jax.config before any backend is initialized (same
# pattern as examples/*.py). Without this, JAX_PLATFORMS=cpu CLI runs would
# still dial the TPU.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Opt-in persistent compile cache (CVSD_COMPILE_CACHE_DIR): skips the 15-40 s
# remote compile on every CLI cold start once a program is cached.
from cvsd_tpu.utils.compile_cache import maybe_enable_compile_cache

maybe_enable_compile_cache()


def add_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", type=str, default=None, help="YAML config path")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="a.b.c=value", help="dotted-path config override (repeatable)")
    p.add_argument("--use_synthetic", action="store_true",
                   help="use the synthetic dataset (reference --use_synthetic)")


def resolve_config(args: argparse.Namespace) -> Dict[str, Any]:
    cfg = load_config(args.config) if args.config else get_default_config()
    cfg = apply_overrides(cfg, args.overrides)
    if getattr(args, "use_synthetic", False):
        cfg["data"]["dataset"] = "synthetic"
    validate_config(cfg)
    return cfg


# architecture fields a detector checkpoint must dictate for the weights to
# apply and decode correctly; runtime fields (thresholds, batch_size,
# stream_depth, ...) stay with the session config
_DETECTOR_ARCH_KEYS = (
    "head_variant", "num_classes", "reg_max", "width_mult", "depth_mult",
    "img_size", "num_keypoints", "pose_head", "channel_divisor", "dtype",
)


def load_detector_cli(path: str, cfg: Dict[str, Any], overrides=None):
    """Load a detector checkpoint for a CLI consumer: returns (variables, cfg)
    with the checkpoint's embedded architecture config merged into
    cfg['detector'] so an imported yolov5u / trained checkpoint (different
    head_variant/width/reg_max than the session default) rebuilds correctly.
    CLI dotted `detector.*` overrides are re-applied afterwards, so explicit
    --set flags still win."""
    from cvsd_tpu.utils.checkpoint import load_checkpoint

    variables, meta = load_checkpoint(path)
    embedded = ((meta or {}).get("config") or {}).get("detector") or {}
    if embedded:
        det = dict(cfg.get("detector", {}) or {})
        for k in _DETECTOR_ARCH_KEYS:
            if k in embedded:
                det[k] = embedded[k]
        cfg = dict(cfg)
        cfg["detector"] = det
        if overrides:
            cfg = apply_overrides(cfg, [o for o in overrides if o.startswith("detector.")])
    return variables, cfg


def maybe_mesh(cfg: Dict[str, Any]):
    """Build a MeshConfig when more than one device is visible."""
    import jax

    from cvsd_tpu.parallel.mesh import MeshConfig

    if len(jax.devices()) > 1:
        return MeshConfig.from_config(cfg)
    return None

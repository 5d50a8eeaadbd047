"""Shared CLI plumbing: config loading + dotted overrides + mesh selection."""

from __future__ import annotations

import argparse
from typing import Any, Dict

from cvsd_tpu.config import apply_overrides, get_default_config, load_config, validate_config


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


def maybe_mesh(cfg: Dict[str, Any]):
    """Build a MeshConfig when more than one device is visible."""
    import jax

    from cvsd_tpu.parallel.mesh import MeshConfig

    if len(jax.devices()) > 1:
        return MeshConfig.from_config(cfg)
    return None

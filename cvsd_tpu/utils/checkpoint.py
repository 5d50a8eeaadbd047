"""Checkpoint store: pytree state + embedded config, per-stage save/restore.

Capability parity with the reference's checkpointing (SURVEY.md §5.4):
- v2 file taxonomy: stage{1,2}_{best,final,epoch{N}} + embedded config
  (reference: shopformer_2/train.py:195-231, 372-426)
- partial restore of gcae/transformer sub-trees
  (reference: shopformer_2/models/shopformer.py:247-293)
- config recovered from inside the checkpoint (shopformer_2/evaluate.py:217-222)

Format: a single msgpack file (flax.serialization) holding
{state, metadata{config, epoch, metrics, history}}. Metadata is JSON-encoded
inside the msgpack so restore never needs the model class.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    state: Any,
    config: Optional[Dict[str, Any]] = None,
    **metadata: Any,
) -> None:
    """Save a pytree `state` plus config/metadata to `path` (.msgpack)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "state": _to_host(state),
        "meta_json": json.dumps({"config": config, **metadata}, default=str),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_checkpoint(path: str, target_state: Any = None) -> Tuple[Any, Dict[str, Any]]:
    """Load (state, metadata). If `target_state` is given, the state is restored
    into its pytree structure (dtype/shape-checked); otherwise returned as raw
    nested dicts of np arrays."""
    with open(path, "rb") as f:
        raw = f.read()
    if target_state is not None:
        payload = serialization.from_bytes({"state": target_state, "meta_json": ""}, raw)
        state = payload["state"]
    else:
        payload = serialization.msgpack_restore(raw)
        state = payload["state"]
    meta = json.loads(payload["meta_json"]) if payload.get("meta_json") else {}
    return state, meta


def load_subtree(path: str, key: str) -> Any:
    """Restore one sub-tree (e.g. 'gcae' or 'transformer' params) from a full
    checkpoint — the v2 prefix-stripping partial loaders
    (reference: shopformer_2/models/shopformer.py:247-293)."""
    state, _ = load_checkpoint(path)
    node = state
    for k in key.split("/"):
        node = node[k]
    return node


def checkpoint_config(path: str) -> Optional[Dict[str, Any]]:
    """Recover the config embedded in a checkpoint
    (reference: shopformer_2/evaluate.py:217-222)."""
    _, meta = load_checkpoint(path)
    return meta.get("config")


class CheckpointManager:
    """Stage-aware best/periodic/final checkpoint cadence
    (reference file taxonomy: shopformer_2/train.py stage{N}_{best,final,epoch{E}}.pt)."""

    def __init__(self, directory: str, config: Optional[Dict[str, Any]] = None):
        self.directory = directory
        self.config = config
        os.makedirs(directory, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.directory, f"{name}.msgpack")

    def save(self, name: str, state: Any, **metadata: Any) -> str:
        p = self.path(name)
        save_checkpoint(p, state, config=self.config, **metadata)
        return p

    def save_best(self, stage: int, state: Any, **metadata: Any) -> str:
        return self.save(f"stage{stage}_best", state, **metadata)

    def save_final(self, stage: int, state: Any, **metadata: Any) -> str:
        return self.save(f"stage{stage}_final", state, **metadata)

    def save_epoch(self, stage: int, epoch: int, state: Any, **metadata: Any) -> str:
        return self.save(f"stage{stage}_epoch{epoch}", state, **metadata)

    def restore(self, name: str, target_state: Any = None) -> Tuple[Any, Dict[str, Any]]:
        return load_checkpoint(self.path(name), target_state)

    def exists(self, name: str) -> bool:
        return os.path.exists(self.path(name))

"""Multi-host / multi-slice initialization and hybrid mesh construction.

SURVEY.md §5.8: the reference has no distributed backend at all; on TPU the
equivalents are `jax.distributed.initialize` for multi-host runs and a device
mesh whose inner axes ride ICI (within a slice) while outer axes cross DCN
(between slices). XLA emits all collectives from sharding annotations — there
is no NCCL-style hand-written communication anywhere in this framework.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed for multi-host TPU pods. No-op (returns
    False) in single-process settings — safe to call unconditionally."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def create_hybrid_mesh(
    ici_shape: Sequence[int],
    dcn_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Mesh whose inner (trailing) axes map to ICI and outer axes to DCN —
    collectives on the 'model' axis then never cross the slower network.

    Falls back to a plain reshaped mesh when mesh_utils is unavailable or the
    topology is flat (CPU tests, single slice).
    """
    if dcn_shape is None:
        devices = np.asarray(jax.devices()).reshape(tuple(ici_shape))
        return Mesh(devices, tuple(axis_names))
    from jax.experimental import mesh_utils

    dev = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=tuple(ici_shape), dcn_mesh_shape=tuple(dcn_shape)
    )
    return Mesh(dev, tuple(axis_names))


def process_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(per-process batch, offset) for multi-host input pipelines: each host
    feeds only its shard of the global batch."""
    n = jax.process_count()
    per = global_batch // n
    return per, per * jax.process_index()

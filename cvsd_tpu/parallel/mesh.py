"""Device mesh + sharding layer — the distributed-communication backend.

The reference has *no* distributed code (SURVEY.md §2.5/§5.8: no
torch.distributed anywhere; NCCL only a transitive pin). On TPU this module
is first-class anyway: it builds the `jax.sharding.Mesh` over ICI, produces
NamedShardings for the batch (data-parallel) and optional model (tensor-
parallel) axes, and stages host->device transfers. All collectives are
emitted by XLA from these sharding annotations — never hand-written.

Usage:
    mcfg = MeshConfig.from_config(cfg)
    mesh = mcfg.mesh
    x = shard_batch(mesh, batch)             # leading dim over 'data'
    train_step = jax.jit(step, in_shardings=..., out_shardings=...)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh_shape(n_devices: int, n_axes: int) -> Tuple[int, ...]:
    """Factor n_devices into n_axes dims, largest first (data axis gets the most)."""
    if n_axes == 1:
        return (n_devices,)
    shape = [n_devices] + [1] * (n_axes - 1)
    # Peel small prime factors onto the trailing (model) axes.
    for axis in range(n_axes - 1, 0, -1):
        for p in (2, 2, 3):
            if shape[0] % p == 0 and shape[0] > p:
                shape[0] //= p
                shape[axis] *= p
                break
    return tuple(shape)


@dataclasses.dataclass
class MeshConfig:
    """Mesh + axis names resolved from the config tree (parallel section)."""

    mesh: Mesh
    batch_axis: str = "data"
    model_axis: Optional[str] = None

    @classmethod
    def from_config(cls, cfg: Dict[str, Any], devices: Optional[Sequence[jax.Device]] = None) -> "MeshConfig":
        p = cfg.get("parallel", {}) if cfg else {}
        axes = tuple(p.get("mesh_axes") or ("data",))
        shape = p.get("mesh_shape")
        mesh = build_mesh(shape, axes, devices)
        return cls(mesh=mesh, batch_axis=p.get("batch_axis", axes[0]), model_axis=p.get("model_axis"))

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    def batch_spec(self, ndim: int) -> P:
        return P(self.batch_axis, *([None] * (ndim - 1)))


def build_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the given devices. shape=None -> all devices on axis 0."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = default_mesh_shape(len(devices), len(axis_names))
    shape = tuple(int(s) for s in shape)
    if math.prod(shape) != len(devices):
        raise ValueError(f"mesh shape {shape} != #devices {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(batch_axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, batch_axis: str = "data") -> Any:
    """device_put a pytree of host arrays with leading dim sharded over `batch_axis`.

    Pads nothing: callers must make the batch divisible by the mesh axis size
    (the data layer's batching does this with pad-and-mask).
    """

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, batch_axis))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """device_put a pytree fully replicated over the mesh (params, opt state)."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

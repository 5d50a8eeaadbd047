import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cvsd_tpu.config import get_default_config
from cvsd_tpu.parallel import MeshConfig, build_mesh, default_mesh_shape, shard_batch


def test_virtual_cpu_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_default_mesh_shape_factoring():
    assert default_mesh_shape(8, 1) == (8,)
    assert default_mesh_shape(8, 2) == (4, 2)
    assert default_mesh_shape(4, 2) == (2, 2)


def test_build_mesh_and_shard_batch():
    mesh = build_mesh(axis_names=("data",))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sx = shard_batch(mesh, x)
    assert sx.shape == (16, 3)
    assert len(sx.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_meshconfig_from_config_2d():
    cfg = get_default_config()
    cfg["parallel"]["mesh_axes"] = ["data", "model"]
    cfg["parallel"]["model_axis"] = "model"
    mc = MeshConfig.from_config(cfg)
    assert mc.mesh.axis_names == ("data", "model")
    assert mc.n_devices == 8
    assert mc.batch_spec(3) == P("data", None, None)


def test_sharded_computation_runs():
    mesh = build_mesh(axis_names=("data",))
    x = np.ones((8, 128), dtype=np.float32)
    sx = shard_batch(mesh, x)
    y = jax.jit(lambda a: (a * 2).sum())(sx)
    assert float(y) == pytest.approx(8 * 128 * 2)

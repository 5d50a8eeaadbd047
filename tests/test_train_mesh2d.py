"""Trainer on a 2-D (data x model) mesh — params replicated, batch sharded on
'data' only; exercises the MeshConfig plumbing beyond the 1-D case."""

import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.parallel import MeshConfig
from cvsd_tpu.train import Trainer


@pytest.mark.slow
def test_trainer_on_2d_mesh(tmp_path):
    cfg = get_default_config()
    cfg["data"]["dataset"] = "synthetic"
    cfg["data"]["synthetic"].update(num_train=32, num_test=32)
    cfg["data"]["batch_size"] = 16
    cfg["model"]["hidden_channels"] = 8
    cfg["training"].update(stage1_epochs=1, stage2_epochs=1)
    cfg["experiment"]["checkpoint_dir"] = str(tmp_path / "ckpt")
    cfg["parallel"]["mesh_axes"] = ["data", "model"]
    cfg["parallel"]["model_axis"] = "model"
    mc = MeshConfig.from_config(cfg)
    assert mc.mesh.shape == {"data": 4, "model": 2}
    artifact = Trainer(cfg, mesh_config=mc, verbose=False).setup().fit()
    assert np.isfinite(artifact["history"]["stage1"][0]["loss"])
    assert np.isfinite(artifact["history"]["stage2"][0]["loss"])

import json
import os

import jax
import numpy as np

from cvsd_tpu.parallel.distributed import (
    create_hybrid_mesh,
    initialize_distributed,
    process_local_batch_slice,
)
from cvsd_tpu.utils.logging import ScalarLogger, StepTimer, device_trace


def test_scalar_logger_jsonl(tmp_path):
    lg = ScalarLogger(str(tmp_path), tensorboard=False)
    lg.log_scalar("Stage1/Loss", 0.5, 1)
    lg.log_dict({"auc_roc": 0.7, "note": "skip-me"}, step=2, prefix="Stage2/")
    lg.log_hparams({"lr": 1e-4}, {"auc_roc": 0.7})
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0]["tag"] == "Stage1/Loss" and lines[0]["value"] == 0.5
    assert lines[1]["tag"] == "Stage2/auc_roc"
    assert len(lines) == 2  # non-numeric values skipped
    hp = json.load(open(tmp_path / "hparams.json"))
    assert hp["metrics"]["auc_roc"] == 0.7


def test_step_timer():
    t = StepTimer()
    t.start()
    x = jax.jit(lambda a: a * 2)(np.ones(8))
    dt = t.stop(x)
    assert dt > 0 and t.mean > 0


def test_device_trace_noop():
    with device_trace(None):
        pass  # no-op path


def test_initialize_distributed_single_process():
    assert initialize_distributed() is False
    assert initialize_distributed(num_processes=1) is False


def test_create_hybrid_mesh_flat():
    mesh = create_hybrid_mesh((4, 2), axis_names=("data", "model"))
    assert mesh.shape == {"data": 4, "model": 2}


def test_process_local_batch_slice():
    per, off = process_local_batch_slice(64)
    assert per == 64 and off == 0  # single process

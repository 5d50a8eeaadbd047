import json
import os

import pytest

from cvsd_tpu.cli import evaluate as cli_evaluate
from cvsd_tpu.cli import inference as cli_inference
from cvsd_tpu.cli import sweep as cli_sweep
from cvsd_tpu.cli import train as cli_train


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "ckpt")
    cli_train.main([
        "--config", "configs/synthetic_smoke.yaml",
        "--output_dir", out,
        "--set", "training.stage1_epochs=1",
        "--set", "training.stage2_epochs=1",
        "--set", "data.synthetic.num_train=32",
        "--set", "data.synthetic.num_test=32",
        "--set", "model.hidden_channels=8",
    ])
    return out


def test_cli_train_artifacts(trained_dir):
    for name in ("stage2_best.msgpack", "training_results.json", "config.json"):
        assert os.path.exists(os.path.join(trained_dir, name))
    with open(os.path.join(trained_dir, "training_results.json")) as f:
        results = json.load(f)
    assert results["config"]["experiment"]["name"] == "synthetic_smoke"


def test_cli_train_stage2_resume(trained_dir):
    # --stage 2 auto-loads stage1_best from the same checkpoint_dir
    cli_train.main([
        "--config", "configs/synthetic_smoke.yaml",
        "--output_dir", trained_dir,
        "--stage", "2",
        "--set", "training.stage2_epochs=1",
        "--set", "data.synthetic.num_train=32",
        "--set", "data.synthetic.num_test=32",
        "--set", "model.hidden_channels=8",
    ])


def test_cli_evaluate(trained_dir, tmp_path, capsys):
    out = str(tmp_path / "evaluation")
    cli_evaluate.main(["--checkpoint", os.path.join(trained_dir, "stage2_best.msgpack"),
                       "--output_dir", out])
    assert os.path.exists(os.path.join(out, "metrics.json"))
    captured = capsys.readouterr()
    assert "auc_roc" in captured.out


def test_cli_inference(trained_dir, tmp_path, capsys):
    out = str(tmp_path / "pred.json")
    cli_inference.main(["--checkpoint", os.path.join(trained_dir, "stage2_best.msgpack"),
                        "--threshold", "0.5", "--output", out])
    assert os.path.exists(out)
    assert "threshold=0.5000" in capsys.readouterr().out


@pytest.mark.slow
def test_cli_sweep_quick(tmp_path):
    out = str(tmp_path / "sweep")
    cli_sweep.main([
        "--mode", "quick", "--output_dir", out, "--max_configs", "1",
        "--set", "data.synthetic.num_train=32",
        "--set", "data.synthetic.num_test=32",
        "--set", "data.batch_size=16",
        "--set", "training.stage1_epochs=1",
        "--set", "training.stage2_epochs=1",
    ])
    with open(os.path.join(out, "sweep_results.json")) as f:
        results = json.load(f)
    assert len(results) == 1 and results[0]["status"] == "ok"

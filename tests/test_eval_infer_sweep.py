import json
import os

import numpy as np
import pytest

from cvsd_tpu.config import get_default_config, merge_configs
from cvsd_tpu.eval import evaluate_checkpoint, load_model
from cvsd_tpu.infer import predict_poses, run_inference
from cvsd_tpu.sweep import analyze_results, generate_configs, run_sweep
from cvsd_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trained")
    cfg = get_default_config()
    cfg["data"]["dataset"] = "synthetic"
    cfg["data"]["synthetic"]["num_train"] = 32
    cfg["data"]["synthetic"]["num_test"] = 32
    cfg["data"]["batch_size"] = 16
    cfg["model"]["hidden_channels"] = 8
    cfg["training"]["stage1_epochs"] = 1
    cfg["training"]["stage2_epochs"] = 1
    cfg["experiment"]["checkpoint_dir"] = str(tmp / "ckpt")
    trainer = Trainer(cfg, verbose=False).setup()
    trainer.fit()
    return cfg, str(tmp / "ckpt" / "stage2_best.msgpack")


def test_load_model_from_embedded_config(trained):
    cfg, ckpt = trained
    scorer = load_model(ckpt)  # config recovered from inside the checkpoint
    assert scorer.config["model"]["hidden_channels"] == 8
    poses = np.zeros((5, 12, 18, 2), np.float32)
    scores = scorer.score(poses)
    assert scores.shape == (5,)


def test_evaluate_checkpoint_artifact(trained, tmp_path):
    cfg, ckpt = trained
    out = str(tmp_path / "evaluation")
    result = evaluate_checkpoint(ckpt, output_dir=out, save_scores=True)
    assert 0 <= result["test_metrics"]["auc_roc"] <= 1
    assert set(result["video_metrics"]) == {"max", "mean", "percentile_95"}
    assert "auc_delta_vs_recorded" in result
    assert len(result["per_sample"]) == result["num_sequences"]
    assert len(result["roc_curve"]["fpr"]) == len(result["roc_curve"]["tpr"])
    assert result["roc_curve"]["fpr"][0] == 0.0 and result["roc_curve"]["fpr"][-1] == 1.0
    assert len(result["pr_curve"]["precision"]) == len(result["pr_curve"]["recall"])
    assert os.path.exists(os.path.join(out, "metrics.json"))
    for plot in ("roc_curve.png", "pr_curve.png", "score_distribution.png"):
        assert os.path.exists(os.path.join(out, plot))


def test_mine_training_history(trained):
    """History is reconstructed from ALL sibling stage checkpoints — a stage-2
    best checkpoint saved mid-training still yields the full stage-1 record
    (reference: shopformer/evaluate.py:107-141)."""
    from cvsd_tpu.eval.evaluate import mine_training_history

    cfg, ckpt = trained
    mined = mine_training_history(ckpt)
    assert len(mined["stage1"]) == 1  # from stage1_final / stage2_final siblings
    assert len(mined["stage2"]) == 1
    assert "best_metrics" in mined and "auc_roc" in mined["best_metrics"]
    assert mined["sources"]  # records where each stage came from
    result = evaluate_checkpoint(ckpt)
    assert len(result["history"]["stage1"]) == 1
    assert result["best_epoch"] is not None


def test_predict_poses(trained):
    cfg, ckpt = trained
    scorer = load_model(ckpt)
    poses = np.random.default_rng(0).normal(size=(7, 12, 18, 2)).astype(np.float32)
    out = predict_poses(scorer, poses, threshold=0.1)
    assert out["scores"].shape == (7,)
    assert set(out["summary"]) == {"mean", "std", "min", "max", "median"}
    assert out["num_anomalies"] == int((out["scores"] >= 0.1).sum())


def test_run_inference_json(trained, tmp_path):
    cfg, ckpt = trained
    out_path = str(tmp_path / "inference.json")
    result = run_inference(ckpt, output_path=out_path)
    assert os.path.exists(out_path)
    assert len(result["predictions"]) == result["num_sequences"]
    with open(out_path) as f:
        loaded = json.load(f)
    assert loaded["threshold"] == result["threshold"]


# ---------- sweep ----------

def test_generate_configs_modes():
    rec = generate_configs("recommended")
    assert len(rec) == 5 and rec[0]["experiment"]["name"] == "baseline"
    assert rec[1]["model"]["hidden_channels"] == 128
    quick = generate_configs("quick")
    assert len(quick) == 2 * 2 * 2 * 2 * 2
    assert all(c["data"]["dataset"] == "synthetic" for c in quick)
    rnd = generate_configs("random", num_random=7, seed=1)
    assert len(rnd) == 7
    # deterministic under the same seed
    rnd2 = generate_configs("random", num_random=7, seed=1)
    assert [c["training"]["lr"] for c in rnd] == [c["training"]["lr"] for c in rnd2]


@pytest.mark.slow
def test_run_sweep_and_analysis(tmp_path):
    base = {
        "data": {"dataset": "synthetic", "batch_size": 16,
                 "synthetic": {"num_train": 32, "num_test": 32}},
        "model": {"hidden_channels": 8},
        "training": {"stage1_epochs": 1, "stage2_epochs": 1},
    }
    configs = generate_configs("quick", base_config=base)[:2]
    results = run_sweep(configs, str(tmp_path / "sweep"))
    assert len(results) == 2
    assert all(r["status"] == "ok" for r in results)
    assert os.path.exists(tmp_path / "sweep" / "sweep_results.json")
    assert os.path.exists(tmp_path / "sweep" / "analysis.json")
    with open(tmp_path / "sweep" / "analysis.json") as f:
        analysis = json.load(f)
    assert analysis["num_ok"] == 2
    assert len(analysis["top"]) == 2


def test_sweep_captures_failures(tmp_path):
    bad = merge_configs(get_default_config(), {"model": {"num_heads": 7}})  # invalid
    bad["experiment"]["name"] = "bad"
    results = run_sweep([bad], str(tmp_path / "sweep"))
    assert results[0]["status"] == "failed"
    assert "divisible" in results[0]["error"]


def test_sweep_per_config_timeout(tmp_path):
    """A slow config is stopped by the per-config wall-clock budget between
    epochs (reference sweep.py:189-195 kills its 2 h subprocess; here
    training.max_seconds aborts in-process) without stalling the sweep."""
    slow = merge_configs(get_default_config(), {
        "data": {"dataset": "synthetic", "batch_size": 16,
                 "synthetic": {"num_train": 32, "num_test": 32}},
        "model": {"hidden_channels": 8},
        # enough requested epochs that an unbounded run would take far longer
        "training": {"stage1_epochs": 200, "stage2_epochs": 200},
    })
    slow["experiment"]["name"] = "slow"
    results = run_sweep([slow], str(tmp_path / "sweep"), timeout_seconds=0.5)
    assert results[0]["status"] == "timeout"
    # the run still produced a result (not a crash) and stopped early
    hist = json.load(open(tmp_path / "sweep" / "slow" / "training_history.json"))
    n_epochs = len(hist["stage1"]) + len(hist["stage2"])
    assert 0 < n_epochs < 400
    assert any("max_seconds" in str(r.get("aborted", "")) for s in ("stage1", "stage2")
               for r in hist[s])


def test_analyze_results_importance():
    results = [
        {"status": "ok", "name": "a", "best_auc": 0.8,
         "config": {"training": {"lr": 1e-4}, "model": {"dropout": 0.1}}},
        {"status": "ok", "name": "b", "best_auc": 0.6,
         "config": {"training": {"lr": 5e-5}, "model": {"dropout": 0.1}}},
        {"status": "failed", "name": "c", "config": {}},
    ]
    analysis = analyze_results(results)
    assert analysis["num_ok"] == 2 and analysis["num_failed"] == 1
    assert analysis["top"][0]["name"] == "a"
    assert analysis["param_importance"]["training.lr"]["0.0001"] == 0.8

import json
import os

import numpy as np
import optax
import pytest

from cvsd_tpu.config import apply_overrides, get_default_config
from cvsd_tpu.parallel import MeshConfig
from cvsd_tpu.train import EarlyStopping, Trainer, build_schedule
from cvsd_tpu.train.optim import PlateauController, build_optimizer, stage_param_labels


def tiny_config(tmp_path, **overrides):
    cfg = get_default_config()
    cfg["data"]["dataset"] = "synthetic"
    cfg["data"]["synthetic"]["num_train"] = 32
    cfg["data"]["synthetic"]["num_test"] = 32
    cfg["data"]["batch_size"] = 16
    cfg["model"]["hidden_channels"] = 8
    cfg["model"]["num_keypoints"] = 18
    cfg["training"]["stage1_epochs"] = 2
    cfg["training"]["stage2_epochs"] = 2
    cfg["training"]["lr"] = 1e-3
    cfg["experiment"]["checkpoint_dir"] = str(tmp_path / "ckpt")
    for k, v in overrides.items():
        node = cfg
        keys = k.split(".")
        for kk in keys[:-1]:
            node = node[kk]
        node[keys[-1]] = v
    return cfg


# ---------- schedules / optim ----------

def test_schedules():
    const = build_schedule("constant", 1e-3, 10, 5)
    assert const == 1e-3
    cos = build_schedule("cosine_warmup", 1e-3, 10, 5, {"warmup_epochs": 1})
    assert float(cos(0)) == pytest.approx(0.0)
    assert float(cos(10)) == pytest.approx(1e-3)
    assert float(cos(50)) < 1e-4
    step = build_schedule("step", 1e-3, 10, 5, {"step_size": 2, "gamma": 0.1})
    assert step(0) == pytest.approx(1e-3)
    assert step(20) == pytest.approx(1e-4)
    exp = build_schedule("exponential", 1e-3, 10, 5, {"gamma": 0.95})
    assert exp(10) == pytest.approx(1e-3 * 0.95)  # one epoch of steps -> per-epoch gamma


def test_cosine_warm_restarts_schedule():
    """CosineAnnealingWarmRestarts semantics (reference shopformer/train.py:484-531):
    cycles of T_0, T_0*T_mult, ... epochs, each restarting at base lr."""
    # 10 steps/epoch, T_0=2 epochs, T_mult=2 -> restarts at epochs 2, 6, 14...
    s = build_schedule("cosine_warm_restarts", 1e-3, 10, 14,
                       {"T_0": 2, "T_mult": 2, "eta_min": 1e-5})
    assert float(s(0)) == pytest.approx(1e-3)
    # end of first cycle: near eta_min
    assert float(s(19)) < 1e-4
    # restart at step 20 (epoch 2): back to base lr
    assert float(s(20)) == pytest.approx(1e-3, rel=1e-3)
    # second cycle is twice as long: restarts again at epoch 6 (step 60)
    assert float(s(59)) < 1e-4
    assert float(s(60)) == pytest.approx(1e-3, rel=1e-3)
    # never below eta_min
    for c in range(0, 140, 7):
        assert float(s(c)) >= 1e-5 - 1e-9
    # T_mult=1: plain periodic restarts every T_0 epochs
    s1 = build_schedule("cosine_warm_restarts", 1e-3, 10, 6, {"T_0": 2, "T_mult": 1})
    assert float(s1(40)) == pytest.approx(1e-3, rel=1e-3)


def test_cosine_warm_restarts_trains(tmp_path):
    cfg = tiny_config(tmp_path, **{"training.scheduler": "cosine_warm_restarts",
                                   "training.stage1_epochs": 2, "training.stage2_epochs": 1})
    artifact = Trainer(cfg, verbose=False).setup().fit()
    assert np.isfinite(artifact["history"]["stage1"][-1]["loss"])


def test_stage_param_labels():
    params = {"gcae": {"w": 1}, "transformer": {"w": 2}}
    assert stage_param_labels(params, 1) == {"gcae": "train", "transformer": "freeze"}
    assert stage_param_labels(params, 2) == {"gcae": "freeze", "transformer": "train"}


def test_frozen_params_do_not_update():
    import jax.numpy as jnp

    cfg = get_default_config()
    cfg["training"]["lr"] = 0.1
    params = {"gcae": {"w": jnp.ones(3)}, "transformer": {"w": jnp.ones(3)}}
    opt = build_optimizer(cfg, 10, 5, param_labels=stage_param_labels(params, 2))
    state = opt.init(params)
    grads = {"gcae": {"w": jnp.ones(3)}, "transformer": {"w": jnp.ones(3)}}
    updates, _ = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["gcae"]["w"]), 1.0)  # frozen
    assert not np.allclose(np.asarray(new["transformer"]["w"]), 1.0)  # trained


def test_early_stopping():
    es = EarlyStopping(patience=2, mode="max")
    assert not es(0.5)
    assert not es(0.6)
    assert not es(0.55)
    assert es(0.55)  # second non-improving epoch
    assert es.best == 0.6


def test_plateau_controller():
    pc = PlateauController(factor=0.5, patience=1, mode="max")
    lr = 1e-3
    lr = pc.update(0.5, lr)
    assert lr == 1e-3
    lr = pc.update(0.4, lr)  # bad 1
    assert lr == 1e-3
    lr = pc.update(0.4, lr)  # bad 2 > patience -> reduce
    assert lr == pytest.approx(5e-4)


# ---------- end-to-end training ----------

@pytest.mark.parametrize("variant", ["v1", "v2"])
@pytest.mark.slow
def test_two_stage_training_runs(tmp_path, variant):
    cfg = tiny_config(tmp_path, **{"model.variant": variant})
    trainer = Trainer(cfg, verbose=False).setup()
    artifact = trainer.fit()
    assert len(artifact["history"]["stage1"]) == 2
    assert len(artifact["history"]["stage2"]) == 2
    assert np.isfinite(artifact["history"]["stage1"][-1]["loss"])
    assert 0.0 <= artifact["test_metrics"]["auc_roc"] <= 1.0
    ckpt_dir = cfg["experiment"]["checkpoint_dir"]
    for name in ("stage1_best", "stage1_final", "stage2_best", "stage2_final"):
        assert os.path.exists(os.path.join(ckpt_dir, f"{name}.msgpack")), name
    assert os.path.exists(os.path.join(ckpt_dir, "training_results.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "config.json"))
    with open(os.path.join(ckpt_dir, "training_results.json")) as f:
        results = json.load(f)
    assert results["config"]["model"]["variant"] == variant
    assert "video_metrics" in results and "score_stats" in results


@pytest.mark.slow
def test_stage1_loss_decreases(tmp_path):
    cfg = tiny_config(tmp_path, **{"training.stage1_epochs": 8, "data.augment.enabled": False})
    trainer = Trainer(cfg, verbose=False).setup()
    trainer.train_stage(1)
    losses = [r["loss"] for r in trainer.history["stage1"]]
    assert losses[-1] < losses[0] * 0.9


@pytest.mark.slow
def test_training_on_mesh(tmp_path):
    cfg = tiny_config(tmp_path)
    mc = MeshConfig.from_config(cfg)
    assert mc.n_devices == 8
    trainer = Trainer(cfg, mesh_config=mc, verbose=False).setup()
    artifact = trainer.fit()
    assert np.isfinite(artifact["history"]["stage2"][-1]["loss"])


@pytest.mark.slow
def test_mesh_matches_single_device(tmp_path):
    """DP sharding must not change the math (same seed, augment off)."""
    cfg1 = tiny_config(tmp_path / "a", **{"data.augment.enabled": False, "model.dropout": 0.0})
    cfg2 = tiny_config(tmp_path / "b", **{"data.augment.enabled": False, "model.dropout": 0.0})
    t1 = Trainer(cfg1, verbose=False).setup()
    t1.train_stage(1)
    t2 = Trainer(cfg2, mesh_config=MeshConfig.from_config(cfg2), verbose=False).setup()
    t2.train_stage(1)
    l1 = [r["loss"] for r in t1.history["stage1"]]
    l2 = [r["loss"] for r in t2.history["stage1"]]
    np.testing.assert_allclose(l1, l2, rtol=1e-4)


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path):
    cfg = tiny_config(tmp_path)
    t1 = Trainer(cfg, verbose=False).setup()
    t1.train_stage(1)
    # new trainer resumes stage 2 from stage1_best automatically
    cfg2 = tiny_config(tmp_path)
    t2 = Trainer(cfg2, verbose=False).setup()
    t2.fit(start_stage=2)
    assert len(t2.history["stage1"]) == 0
    assert len(t2.history["stage2"]) == 2


@pytest.mark.slow
def test_grad_accum_and_schedulers(tmp_path):
    for sched in ("cosine_warmup", "exponential", "step", "reduce_on_plateau"):
        cfg = tiny_config(
            tmp_path / sched,
            **{"training.grad_accum_steps": 2, "training.scheduler": sched,
               "training.stage1_epochs": 1, "training.stage2_epochs": 1},
        )
        artifact = Trainer(cfg, verbose=False).setup().fit()
        assert np.isfinite(artifact["history"]["stage1"][0]["loss"]), sched


@pytest.mark.slow
def test_scan_epoch_matches_per_batch(tmp_path):
    """lax.scan whole-epoch training must match the per-batch path
    (augment/dropout off so RNG keys don't enter the math)."""
    base = tiny_config(tmp_path / "a", **{"data.augment.enabled": False, "model.dropout": 0.0,
                                          "training.stage1_epochs": 3, "training.stage2_epochs": 0})
    sc = tiny_config(tmp_path / "b", **{"data.augment.enabled": False, "model.dropout": 0.0,
                                        "training.stage1_epochs": 3, "training.stage2_epochs": 0,
                                        "training.scan_epoch": True})
    t1 = Trainer(base, verbose=False).setup(); t1.train_stage(1)
    t2 = Trainer(sc, verbose=False).setup(); t2.train_stage(1)
    l1 = [r["loss"] for r in t1.history["stage1"]]
    l2 = [r["loss"] for r in t2.history["stage1"]]
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


@pytest.mark.slow
def test_scan_epoch_on_mesh_matches_per_batch(tmp_path):
    """scan_epoch must compose with the DP mesh (VERDICT r1 weak #5): stacked
    epoch batches sharded on the per-batch axis, math identical to the
    single-device per-batch path."""
    base = tiny_config(tmp_path / "a", **{"data.augment.enabled": False, "model.dropout": 0.0,
                                          "training.stage1_epochs": 3, "training.stage2_epochs": 0})
    sc = tiny_config(tmp_path / "b", **{"data.augment.enabled": False, "model.dropout": 0.0,
                                        "training.stage1_epochs": 3, "training.stage2_epochs": 0,
                                        "training.scan_epoch": True})
    t1 = Trainer(base, verbose=False).setup(); t1.train_stage(1)
    t2 = Trainer(sc, mesh_config=MeshConfig.from_config(sc), verbose=False).setup()
    t2.train_stage(1)
    l1 = [r["loss"] for r in t1.history["stage1"]]
    l2 = [r["loss"] for r in t2.history["stage1"]]
    # f32 reduction-order differences under the DP psum compound over epochs
    np.testing.assert_allclose(l1, l2, rtol=5e-4)


@pytest.mark.slow
def test_scan_epoch_chunked_matches_whole(tmp_path):
    """Chunked epoch scan (bounded host memory) == one-dispatch epoch scan."""
    a = tiny_config(tmp_path / "a", **{"data.augment.enabled": False, "model.dropout": 0.0,
                                       "data.synthetic.num_train": 64, "data.batch_size": 8,
                                       "training.stage1_epochs": 2, "training.stage2_epochs": 0,
                                       "training.scan_epoch": True})
    b = tiny_config(tmp_path / "b", **{"data.augment.enabled": False, "model.dropout": 0.0,
                                       "data.synthetic.num_train": 64, "data.batch_size": 8,
                                       "training.stage1_epochs": 2, "training.stage2_epochs": 0,
                                       "training.scan_epoch": True,
                                       "training.scan_epoch_chunk": 3})
    t1 = Trainer(a, verbose=False).setup(); t1.train_stage(1)
    t2 = Trainer(b, verbose=False).setup(); t2.train_stage(1)
    l1 = [r["loss"] for r in t1.history["stage1"]]
    l2 = [r["loss"] for r in t2.history["stage1"]]
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_zero_epoch_stage_does_not_crash(tmp_path):
    """Regression (ADVICE r1): stage with 0 epochs must not hit an unbound
    epoch_loss in save_final."""
    cfg = tiny_config(tmp_path, **{"training.stage1_epochs": 1, "training.stage2_epochs": 0})
    artifact = Trainer(cfg, verbose=False).setup().fit()
    assert len(artifact["history"]["stage2"]) == 0


@pytest.mark.slow
def test_scan_epoch_with_accum_and_scheduler(tmp_path):
    cfg = tiny_config(tmp_path, **{"training.scan_epoch": True,
                                   "training.grad_accum_steps": 2,
                                   "training.scheduler": "exponential",
                                   "training.stage1_epochs": 2,
                                   "training.stage2_epochs": 1})
    artifact = Trainer(cfg, verbose=False).setup().fit()
    assert np.isfinite(artifact["history"]["stage1"][-1]["loss"])
    assert np.isfinite(artifact["history"]["stage2"][-1]["loss"])


@pytest.mark.slow
def test_remat_matches_baseline(tmp_path):
    """jax.checkpoint rematerialization must not change the math."""
    base = tiny_config(tmp_path / "a", **{"data.augment.enabled": False, "model.dropout": 0.0,
                                          "training.stage1_epochs": 2, "training.stage2_epochs": 0})
    rm = tiny_config(tmp_path / "b", **{"data.augment.enabled": False, "model.dropout": 0.0,
                                        "training.stage1_epochs": 2, "training.stage2_epochs": 0,
                                        "training.remat": True})
    t1 = Trainer(base, verbose=False).setup(); t1.train_stage(1)
    t2 = Trainer(rm, verbose=False).setup(); t2.train_stage(1)
    l1 = [r["loss"] for r in t1.history["stage1"]]
    l2 = [r["loss"] for r in t2.history["stage1"]]
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


@pytest.mark.slow
def test_pipeline_learns_synthetic_anomalies(tmp_path):
    """Learning regression: the two-stage pipeline must clearly separate the
    synthetic anomalies (reference smoke path analog). See RESULTS.md."""
    cfg = tiny_config(
        tmp_path,
        **{"data.synthetic.num_train": 256, "data.synthetic.num_test": 128,
           "data.batch_size": 64, "model.hidden_channels": 16,
           "training.stage1_epochs": 8, "training.stage2_epochs": 8,
           "training.lr": 1e-3,
           "training.checkpoint_every_n_epochs": 5},  # exercises save_epoch
    )
    artifact = Trainer(cfg, verbose=False).setup().fit()
    assert artifact["best_auc"] > 0.8, artifact["best_auc"]
    assert os.path.exists(os.path.join(cfg["experiment"]["checkpoint_dir"],
                                       "stage1_epoch5.msgpack"))


def test_checkpoint_roundtrip(tmp_path):
    from cvsd_tpu.utils.checkpoint import checkpoint_config, load_checkpoint, save_checkpoint

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    p = str(tmp_path / "x.msgpack")
    save_checkpoint(p, state, config={"model": {"variant": "v2"}}, epoch=3)
    loaded, meta = load_checkpoint(p)
    np.testing.assert_array_equal(loaded["params"]["w"], state["params"]["w"])
    assert meta["epoch"] == 3
    assert checkpoint_config(p)["model"]["variant"] == "v2"

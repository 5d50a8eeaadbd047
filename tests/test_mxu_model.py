"""Tests for the analytic MXU lane-occupancy model (examples/mxu_utilization_model.py)
and the hard-train example's partial checkpoint/resume.

The model explains PROFILE.md's fitted compute ceiling (VERDICT r3 weak #6);
these tests pin its arithmetic so the PROFILE numbers stay reproducible.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_EX, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_pad_and_single_conv_util():
    m = _load("mxu_utilization_model")
    assert m._pad(1) == 128 and m._pad(128) == 128 and m._pad(129) == 256
    # one conv: K = 3*3*48 = 432 -> pad 512; N = 48 -> pad 128
    rows, weighted = m.analyze([dict(kh=3, kw=3, cin=48, cout=48, oh=10, ow=10, b=1)])
    expect = (432 / 512) * (48 / 128)
    assert rows[0]["util"] == pytest.approx(expect)
    assert weighted == pytest.approx(expect)
    assert rows[0]["gflops"] == pytest.approx(2 * 100 * 432 * 48 / 1e9)


def test_weighted_util_is_flop_weighted_harmonic():
    m = _load("mxu_utilization_model")
    # two convs with utils u1=1.0 (K=N=128) and u2=0.5 (K=128, N=64), equal FLOPs
    # would give 2/(1/1 + 1/0.5) = 0.666; make FLOPs equal via spatial size
    c1 = dict(kh=1, kw=1, cin=128, cout=128, oh=8, ow=8, b=1)
    c2 = dict(kh=1, kw=1, cin=128, cout=64, oh=8, ow=16, b=1)
    rows, weighted = m.analyze([c1, c2])
    assert rows[0]["util"] == pytest.approx(1.0)
    assert rows[1]["util"] == pytest.approx(0.5)
    assert weighted == pytest.approx(2 / 3)


def test_full_lane_conv_hits_ceiling_one():
    m = _load("mxu_utilization_model")
    _, weighted = m.analyze([dict(kh=1, kw=1, cin=256, cout=512, oh=4, ow=4, b=2)])
    assert weighted == pytest.approx(1.0)


def test_jaxpr_walk_finds_detector_convs():
    m = _load("mxu_utilization_model")
    convs = m.conv_shapes_from_jaxpr(width_mult=0.25, img=64, depth_mult=0.34)
    assert len(convs) > 20  # backbone + neck + heads
    # first conv is the stem: 3 input channels
    assert any(c["cin"] == 3 for c in convs)
    # util ceiling in (0, 1]
    _, weighted = m.analyze(convs)
    assert 0.0 < weighted <= 1.0


def test_hard_train_partial_roundtrip(tmp_path):
    ht = _load("train_detector_hard")
    import jax

    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.train.detector_train import DetectorTrainer

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           num_keypoints=17)
    trainer = DetectorTrainer(model, lr=1e-3, kpt_weight=0.1)
    out = str(tmp_path / "res.json")
    ht._save_partial(out, trainer, done=7, losses=[1.0, 2.0])

    # fresh trainer with different params must adopt the saved state exactly
    trainer2 = DetectorTrainer(model, lr=1e-3, kpt_weight=0.1, seed=1)
    done, losses = ht._load_partial(out, trainer2)
    assert done == 7 and losses == [1.0, 2.0]
    a = jax.tree_util.tree_leaves(trainer.variables["params"])
    b = jax.tree_util.tree_leaves(trainer2.variables["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # no partial files -> (0, [])
    done0, losses0 = ht._load_partial(str(tmp_path / "other.json"), trainer2)
    assert done0 == 0 and losses0 == []

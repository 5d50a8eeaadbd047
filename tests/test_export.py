"""jax.export serving artifacts (serve/export.py)."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def tiny_detector():
    from cvsd_tpu.models.detector import PersonDetector

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           num_keypoints=0, dtype=np.float32)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def test_export_detector_roundtrip(tiny_detector, tmp_path):
    from cvsd_tpu.models.detector import make_detect_fn
    from cvsd_tpu.serve.export import (call_exported, export_detector,
                                       load_exported, save_exported)

    model, variables = tiny_detector
    exp = export_detector(model, variables, conf_thresh=0.0, max_detections=8,
                          platforms=("cpu",))
    path = str(tmp_path / "det.stablehlo")
    save_exported(exp, path)
    loaded = load_exported(path)

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    out = call_exported(loaded, imgs)
    boxes, scores, valid = (np.asarray(o) for o in out[:3])
    assert boxes.shape == (3, 8, 4) and scores.shape == (3, 8)

    # numerics must match the in-framework jitted path (same nms method)
    direct = make_detect_fn(model, conf_thresh=0.0, max_detections=8,
                            nms_method="xla")(variables, imgs)
    np.testing.assert_allclose(boxes, np.asarray(direct[0]), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(scores, np.asarray(direct[1]), rtol=1e-5, atol=1e-5)


def test_export_detector_symbolic_batch(tiny_detector):
    from cvsd_tpu.serve.export import call_exported, export_detector

    model, variables = tiny_detector
    exp = export_detector(model, variables, conf_thresh=0.0, max_detections=8,
                          platforms=("cpu",))
    for b in (1, 5):
        imgs = np.zeros((b, 64, 64, 3), np.float32)
        out = call_exported(exp, imgs)
        assert np.asarray(out[0]).shape == (b, 8, 4)


def test_export_scorer_roundtrip(tmp_path):
    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.shopformer import build_shopformer
    from cvsd_tpu.serve.export import (call_exported, export_scorer,
                                       load_exported, save_exported)

    cfg = get_default_config()
    cfg["model"]["hidden_channels"] = 8
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)
    exp = export_scorer(scorer, platforms=("cpu",))
    path = str(tmp_path / "scorer.stablehlo")
    save_exported(exp, path)
    loaded = load_exported(path)

    T = int(cfg["model"].get("seq_len", 12))
    V = int(cfg["model"].get("num_keypoints", 18))
    poses = np.random.default_rng(0).normal(size=(4, T, V, 2)).astype(np.float32)
    scores = np.asarray(call_exported(loaded, poses))
    assert scores.shape == (4,) and np.isfinite(scores).all()
    direct = np.asarray(scorer._score(scorer.variables, poses))
    np.testing.assert_allclose(scores, direct, rtol=1e-5, atol=1e-6)

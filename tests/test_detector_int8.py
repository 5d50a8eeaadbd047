"""Post-training int8 detector quantization (models/detector_int8.py).

Covers the capability the reference gets from ultralytics' TensorRT-int8
deployment path (/root/reference/model.py:14-81): BN folding, per-channel
weight quantization, activation calibration, and drop-in compatibility with
the fused detect function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvsd_tpu.models.detector import PersonDetector, make_detect_fn
from cvsd_tpu.models.detector_int8 import (
    QuantPersonDetector,
    calibrate,
    convert_variables,
    quant_model_like,
    quantize_detector,
)

W, D = 0.25, 0.34  # tiny scale point for CPU speed
IMG = 64


def _float_model(head="anchor_free", num_keypoints=0):
    return PersonDetector(img_size=IMG, width_mult=W, depth_mult=D,
                          num_keypoints=num_keypoints, head_variant=head,
                          num_classes=1 if head == "v8dfl" else 80)


def _randomized_variables(model, seed=0):
    """Init variables, then randomize BN stats/affine + conv kernels so BN
    folding is exercised on non-trivial values (init stats are 0-mean/1-var,
    which would make folding a no-op)."""
    variables = model.init_variables(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed + 1)

    def rand_params(path, leaf):
        name = path[-1].key
        arr = np.asarray(leaf, np.float32)
        if name in ("kernel", "scale"):
            return jnp.asarray(rng.normal(0, 0.08, arr.shape).astype(arr.dtype)
                               if name == "kernel" else
                               rng.uniform(0.5, 1.5, arr.shape).astype(np.float32))
        if name == "bias":
            return jnp.asarray(rng.normal(0, 0.05, arr.shape).astype(np.float32))
        return leaf

    def rand_stats(path, leaf):
        name = path[-1].key
        arr = np.asarray(leaf, np.float32)
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.2, arr.shape).astype(np.float32))
        if name == "var":
            return jnp.asarray(rng.uniform(0.3, 2.0, arr.shape).astype(np.float32))
        return leaf

    return {
        "params": jax.tree_util.tree_map_with_path(rand_params, variables["params"]),
        "batch_stats": jax.tree_util.tree_map_with_path(rand_stats, variables["batch_stats"]),
    }


def _calib_batches(n=2, b=2, seed=3):
    rng = np.random.RandomState(seed)
    return [rng.uniform(0, 1, (b, IMG, IMG, 3)).astype(np.float32) for _ in range(n)]


def test_converted_tree_matches_quant_init():
    """convert_variables output must line up leaf-for-leaf (names + shapes)
    with QuantPersonDetector.init — the scope-mirroring contract."""
    model = _float_model()
    variables = _randomized_variables(model)
    qmodel = quant_model_like(model)
    qref = qmodel.init_variables(jax.random.PRNGKey(0))
    qconv = convert_variables(variables)

    ref_leaves = jax.tree_util.tree_flatten_with_path(qref["params"])[0]
    conv_leaves = jax.tree_util.tree_flatten_with_path(qconv["params"])[0]
    ref_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in ref_leaves}
    conv_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in conv_leaves}
    assert ref_map == conv_map


def test_observe_mode_matches_float_model():
    """BN folding + per-channel weight quantization alone (observe mode runs
    the folded/dequantized weights in float) must track the float model's
    eval-mode forward closely."""
    model = _float_model()
    variables = _randomized_variables(model)
    qmodel = quant_model_like(model)
    qvars = convert_variables(variables)

    x = jnp.asarray(_calib_batches(1)[0])
    ref = model.apply(variables, x, train=False)
    got, _ = qmodel.apply(qvars, x, train=False, observe=True,
                          mutable=["quant_stats"])
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        g = np.asarray(got[k], np.float32)
        denom = np.maximum(np.abs(r).max(), 1e-6)
        assert np.abs(r - g).max() / denom < 0.05, k


@pytest.mark.parametrize("head", ["anchor_free", "v8dfl"])
def test_quantized_forward_tracks_float(head):
    """Full int8 path (weights + calibrated activations) stays close to the
    float forward on in-distribution images."""
    model = _float_model(head=head)
    variables = _randomized_variables(model, seed=1)
    qmodel, qvars = quantize_detector(model, variables, _calib_batches())

    x = jnp.asarray(_calib_batches(1, seed=9)[0])
    ref = np.concatenate([np.asarray(v, np.float32).reshape(-1)
                          for v in model.apply(variables, x, train=False).values()])
    raw = qmodel.apply(qvars, x, train=False)
    got = np.concatenate([np.asarray(v, np.float32).reshape(-1)
                          for v in raw.values()])
    corr = np.corrcoef(ref, got)[0, 1]
    assert corr > 0.99, f"int8/float correlation {corr:.4f}"
    denom = np.abs(ref).max()
    assert np.abs(ref - got).max() / denom < 0.15


def test_calibrate_sets_positive_scales():
    model = _float_model()
    variables = _randomized_variables(model)
    qmodel = quant_model_like(model)
    qvars = calibrate(qmodel, convert_variables(variables), _calib_batches())
    scales = [np.asarray(v) for p, v in
              jax.tree_util.tree_flatten_with_path(qvars["params"])[0]
              if p[-1].key == "act_scale"]
    assert len(scales) > 10
    assert all(s > 0 for s in scales)
    # calibration must actually move scales off the 1.0 init
    assert any(abs(float(s) - 1.0) > 1e-3 for s in scales)


def test_quantize_cli_roundtrip(tmp_path):
    """cli.quantize_detector: float checkpoint -> int8 checkpoint ->
    load_detector_checkpoint rebuilds a QuantPersonDetector whose apply runs."""
    from cvsd_tpu.cli.quantize_detector import main as quantize_main
    from cvsd_tpu.data.video import write_test_video
    from cvsd_tpu.models.detector import load_detector_checkpoint
    from cvsd_tpu.utils.checkpoint import save_checkpoint

    model = _float_model()
    variables = _randomized_variables(model)
    det_cfg = {"img_size": IMG, "width_mult": W, "depth_mult": D,
               "pose_head": False, "head_variant": "anchor_free",
               "num_classes": 80, "reg_max": 16, "dtype": "bfloat16"}
    float_ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(float_ckpt, jax.device_get(variables), config={"detector": det_cfg})
    vid = str(tmp_path / "calib.mp4")
    write_test_video(vid, num_frames=8, width=96, height=64)
    q_ckpt = str(tmp_path / "det_int8.msgpack")
    quantize_main(["--detector_checkpoint", float_ckpt, "--output", q_ckpt,
                   "--calib_video", vid, "--calib_frames", "8",
                   "--calib_batch", "4"])

    qmodel, qvars, meta = load_detector_checkpoint(q_ckpt)
    assert isinstance(qmodel, QuantPersonDetector)
    assert meta["config"]["detector"]["quantized"] is True
    x = jnp.asarray(_calib_batches(1)[0])
    raw = qmodel.apply(qvars, x, train=False)
    assert set(raw) == {"p3", "p4", "p5"}
    # int8 weights survive the msgpack round trip as int8
    leaf = np.asarray(qvars["params"]["Backbone_0"]["ConvBNAct_0"]["w_int8"])
    assert leaf.dtype == np.int8

    # --qat_steps: fine-tune before emitting; checkpoint stays consumer-loadable
    q2_ckpt = str(tmp_path / "det_int8_qat.msgpack")
    quantize_main(["--detector_checkpoint", float_ckpt, "--output", q2_ckpt,
                   "--calib_video", vid, "--calib_frames", "8",
                   "--calib_batch", "4", "--qat_steps", "2", "--qat_batch", "2"])
    qmodel2, qvars2, meta2 = load_detector_checkpoint(q2_ckpt)
    assert isinstance(qmodel2, QuantPersonDetector)
    assert meta2["config"]["detector"]["quantized"] is True
    raw2 = qmodel2.apply(qvars2, x, train=False)
    assert set(raw2) == {"p3", "p4", "p5"}
    leaf2 = np.asarray(qvars2["params"]["Backbone_0"]["ConvBNAct_0"]["w_int8"])
    assert leaf2.dtype == np.int8


def test_qat_forward_tracks_float_and_finalize_is_consistent():
    """prepare_qat's fake-quant forward tracks the float model; finalize_qat
    produces serving int8 variables whose forward matches the fake-quant
    forward near-exactly (same arithmetic by construction)."""
    from cvsd_tpu.models.detector_int8 import finalize_qat, prepare_qat

    model = _float_model()
    variables = _randomized_variables(model, seed=4)
    qat_model, qat_vars = prepare_qat(model, variables, _calib_batches())

    x = jnp.asarray(_calib_batches(1, seed=11)[0])
    ref = np.concatenate([np.asarray(v, np.float32).reshape(-1)
                          for v in model.apply(variables, x, train=False).values()])
    qat_raw = qat_model.apply(qat_vars, x, train=False)
    got = np.concatenate([np.asarray(v, np.float32).reshape(-1)
                          for v in qat_raw.values()])
    assert np.corrcoef(ref, got)[0, 1] > 0.99

    serving_model = quant_model_like(model)
    serving_vars = finalize_qat(qat_vars)
    qref = serving_model.init_variables(jax.random.PRNGKey(0))
    ref_shapes = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                  jax.tree_util.tree_flatten_with_path(qref["params"])[0]}
    got_shapes = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                  jax.tree_util.tree_flatten_with_path(serving_vars["params"])[0]}
    assert ref_shapes == got_shapes
    serving_raw = serving_model.apply(serving_vars, x, train=False)
    for k in qat_raw:
        a = np.asarray(qat_raw[k], np.float32)
        b = np.asarray(serving_raw[k], np.float32)
        # bf16 inter-layer casts make this near- not bit-exact
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.02, k


def test_qat_finetune_reduces_loss_and_freezes_act_scales():
    """A few fake-quant fine-tune steps on the synthetic rectangle fixture
    reduce the detection loss while every calibrated act_scale stays fixed."""
    from cvsd_tpu.models.detector_int8 import prepare_qat
    from cvsd_tpu.train.detector_train import synthetic_detection_batch
    from cvsd_tpu.train.qat import QATFineTuner

    model = _float_model()
    variables = _randomized_variables(model, seed=5)
    qat_model, qat_vars = prepare_qat(model, variables, _calib_batches())
    scales_before = {jax.tree_util.keystr(p): float(v) for p, v in
                     jax.tree_util.tree_flatten_with_path(qat_vars["params"])[0]
                     if p[-1].key == "act_scale"}

    tuner = QATFineTuner(qat_model, qat_vars, lr=3e-4)
    rng = np.random.default_rng(0)
    imgs, gb, gv = synthetic_detection_batch(rng, 4, IMG)
    first = tuner.train_step(imgs, gb, gv)["loss"]
    losses = [first]
    for _ in range(14):
        imgs, gb, gv = synthetic_detection_batch(rng, 4, IMG)
        losses.append(tuner.train_step(imgs, gb, gv)["loss"])
    assert np.mean(losses[-5:]) < losses[0], losses

    scales_after = {jax.tree_util.keystr(p): float(v) for p, v in
                    jax.tree_util.tree_flatten_with_path(
                        tuner.variables["params"])[0]
                    if p[-1].key == "act_scale"}
    assert scales_before == scales_after


def test_qat_scan_matches_step_sequence():
    """train_steps_scan is the same optimization as N train_step calls."""
    from cvsd_tpu.models.detector_int8 import prepare_qat
    from cvsd_tpu.train.detector_train import synthetic_detection_batch
    from cvsd_tpu.train.qat import QATFineTuner

    model = _float_model()
    variables = _randomized_variables(model, seed=6)
    qat_model, qat_vars = prepare_qat(model, variables, _calib_batches())
    rng = np.random.default_rng(1)
    steps = [synthetic_detection_batch(rng, 2, IMG) for _ in range(3)]

    a = QATFineTuner(qat_model, qat_vars, lr=1e-3)
    seq_losses = [a.train_step(*s)["loss"] for s in steps]
    b = QATFineTuner(qat_model, qat_vars, lr=1e-3)
    scan_losses = b.train_steps_scan(
        np.stack([s[0] for s in steps]), np.stack([s[1] for s in steps]),
        np.stack([s[2] for s in steps]))["losses"]
    # step 0 is bit-identical; later steps drift slightly because fake-quant
    # round() boundaries discretize tiny fusion-order differences between the
    # two compiled programs — same trajectory, not a logic divergence
    np.testing.assert_allclose(seq_losses, scan_losses, rtol=3e-3)


def test_detect_fn_accepts_quant_model():
    """make_detect_fn (decode + NMS) runs unchanged on the quantized model,
    with keypoints."""
    model = _float_model(num_keypoints=17)
    variables = _randomized_variables(model, seed=2)
    qmodel, qvars = quantize_detector(model, variables, _calib_batches())
    detect = make_detect_fn(qmodel, conf_thresh=0.0, max_detections=8)
    x = jnp.asarray(_calib_batches(1, b=2)[0])
    boxes, scores, valid, kpts = detect(qvars, x)
    assert boxes.shape == (2, 8, 4)
    assert scores.shape == (2, 8)
    assert kpts.shape == (2, 8, 17, 3)
    assert np.isfinite(np.asarray(boxes, np.float32)).all()

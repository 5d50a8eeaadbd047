import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvsd_tpu.data.render import rendered_pose_crop_batch
from cvsd_tpu.models.pose_topdown import (
    TopDownPoseNet,
    crop_and_resize,
    pose_from_boxes,
    soft_argmax,
)
from cvsd_tpu.train.pose_topdown_train import TopDownPoseTrainer


def test_soft_argmax_recovers_peaks():
    h = jnp.full((1, 16, 16, 2), -1e9)
    h = h.at[0, 3, 7, 0].set(20.0).at[0, 12, 1, 1].set(20.0)
    c, conf = soft_argmax(h)
    np.testing.assert_allclose(np.asarray(c[0, 0]), [(7 + 0.5) / 16, (3 + 0.5) / 16], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c[0, 1]), [(1 + 0.5) / 16, (12 + 0.5) / 16], atol=1e-6)
    assert np.asarray(conf).min() > 0.99


def test_crop_identity_and_mapping():
    img = jnp.arange(8 * 8 * 3, dtype=jnp.float32).reshape(8, 8, 3)
    crop, origin, scale = crop_and_resize(img, jnp.asarray([0.0, 0.0, 8.0, 8.0]), 8,
                                          pad_frac=0.0)
    np.testing.assert_allclose(np.asarray(crop), np.asarray(img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(origin), [0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale), [1, 1], atol=1e-6)
    # sub-region crop maps coordinates correctly: frame = origin + crop*scale
    crop2, origin2, scale2 = crop_and_resize(img, jnp.asarray([2.0, 1.0, 6.0, 5.0]), 4,
                                             pad_frac=0.0)
    np.testing.assert_allclose(np.asarray(origin2), [2, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale2), [1, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(crop2), np.asarray(img[1:5, 2:6]), atol=1e-5)


def test_pose_from_boxes_shapes_and_range():
    model = TopDownPoseNet(num_keypoints=5, width=8, crop_size=32)
    variables = model.init_variables(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 48, 48, 3)).astype(np.float32))
    boxes = jnp.asarray([[[4.0, 4.0, 40.0, 44.0], [10, 10, 20, 30]],
                         [[0.0, 0.0, 48.0, 48.0], [5, 5, 25, 25]]])
    kpts, crops = pose_from_boxes(model, variables, imgs, boxes)
    assert kpts.shape == (2, 2, 5, 3)
    assert crops.shape == (2, 2, 32, 32, 3)
    k = np.asarray(kpts)
    assert np.isfinite(k).all()
    assert (k[..., 2] >= 0).all() and (k[..., 2] <= 1).all()
    # predicted coords stay inside the padded box region
    for b in range(2):
        for m in range(2):
            x1, y1, x2, y2 = np.asarray(boxes[b, m])
            w, h = (x2 - x1) * 1.25, (y2 - y1) * 1.25
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            assert (k[b, m, :, 0] >= cx - w / 2 - 1e-3).all()
            assert (k[b, m, :, 0] <= cx + w / 2 + 1e-3).all()


@pytest.mark.slow
def test_topdown_trainer_learns():
    """A tiny top-down net beats the mean-pose floor quickly: loss drops and
    held-out crop-space error improves on jittered poses (the task the
    one-stage head provably fails — see RESULTS.md)."""
    rng = np.random.default_rng(0)
    model = TopDownPoseNet(num_keypoints=17, width=8, crop_size=32)
    tr = TopDownPoseTrainer(model, lr=2e-3, total_steps=60)
    first = None
    for i in range(60):
        f, b, k = rendered_pose_crop_batch(rng, 8, frame_size=48)
        loss = tr.train_step(f, b, k)
        if first is None:
            first = loss
    assert loss < first * 0.5, (first, loss)


def test_topdown_checkpoint_roundtrip(tmp_path):
    from cvsd_tpu.train.pose_topdown_train import load_pose_topdown_checkpoint

    model = TopDownPoseNet(num_keypoints=5, width=8, crop_size=32)
    tr = TopDownPoseTrainer(model, lr=1e-3)
    f, b, k = rendered_pose_crop_batch(np.random.default_rng(0), 4, frame_size=48)
    tr.train_step(f, b, k[:, :5])
    path = str(tmp_path / "td.msgpack")
    tr.save(path, steps=1)
    model2, variables2, meta = load_pose_topdown_checkpoint(path)
    assert model2.num_keypoints == 5 and model2.crop_size == 32
    imgs = jnp.asarray(f)
    out1, _ = pose_from_boxes(model, tr.variables, imgs, jnp.asarray(b)[:, None, :])
    out2, _ = pose_from_boxes(model2, variables2, imgs, jnp.asarray(b)[:, None, :])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_pipeline_topdown_mode():
    """DetectionPipeline with detector.pose_mode='topdown': the crop pose net
    runs inside the fused program and returns (B, M, K, 3) canvas-space kpts
    like the one-stage head path."""
    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline

    cfg = get_default_config()
    cfg["detector"].update(img_size=64, width_mult=0.25, depth_mult=0.34, batch_size=4,
                           conf_threshold=0.0, max_detections=4, dtype="float32",
                           pose_mode="topdown",
                           pose_topdown={"num_keypoints": 17, "width": 8, "crop_size": 32})
    p = DetectionPipeline(cfg)
    frames = np.random.default_rng(0).integers(0, 255, (2, 48, 64, 3)).astype(np.uint8)
    out = p.detect_frames(frames)
    assert len(out) == 5
    boxes, xywhn, scores, valid, kpts = out
    assert kpts.shape == (2, 4, 17, 3)
    assert np.isfinite(kpts).all()

"""DP inference: detection results over a mesh must match single-device."""

import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.parallel import MeshConfig
from cvsd_tpu.pipeline.preprocess import DetectionPipeline


def test_detection_on_mesh_matches_single_device(rng):
    cfg = get_default_config()
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=8, conf_threshold=0.0, max_detections=8,
                           dtype="float32")
    single = DetectionPipeline(cfg)
    mc = MeshConfig.from_config(cfg)
    sharded = DetectionPipeline(cfg, variables=single.variables, mesh_config=mc)
    assert sharded.batch_size % 8 == 0

    frames = rng.integers(0, 255, (8, 240, 320, 3)).astype(np.uint8)
    out_s = single.detect_frames(frames)
    out_m = sharded.detect_frames(frames)
    for a, b in zip(out_s, out_m):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_detector_training_on_mesh_matches_single_device(rng):
    """DP detector training: params after N steps match the single-device
    trajectory (same data, batch sharded over the 8-device data axis)."""
    import jax
    import jax.numpy as jnp

    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.train.detector_train import DetectorTrainer, synthetic_detection_batch

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           dtype=jnp.float32)
    cfg = get_default_config()
    mc = MeshConfig.from_config(cfg)
    single = DetectorTrainer(model, lr=1e-3, seed=0)
    dp = DetectorTrainer(model, lr=1e-3, seed=0, mesh_config=mc)

    data = [synthetic_detection_batch(np.random.default_rng(i), 8, 64, max_gt=2)
            for i in range(3)]
    for images, boxes, valid in data:
        m_s = single.train_step(images, boxes, valid)
        m_d = dp.train_step(images, boxes, valid)
        # sharded reductions reorder f32 sums; adam amplifies near-zero-grad
        # differences by ~lr per step, so equality is loss-level + coarse params
        np.testing.assert_allclose(m_s["loss"], m_d["loss"], rtol=1e-3)
    flat_s = jax.tree_util.tree_leaves(single.variables["params"])
    flat_d = jax.tree_util.tree_leaves(dp.variables["params"])
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_detector_scan_training_on_mesh(rng):
    """train_steps_scan under the mesh: scan axis stays unsharded, per-batch
    dim sharded; loss curve matches the single-device scan."""
    import jax.numpy as jnp

    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.train.detector_train import DetectorTrainer, synthetic_detection_batch

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           dtype=jnp.float32)
    cfg = get_default_config()
    mc = MeshConfig.from_config(cfg)
    single = DetectorTrainer(model, lr=1e-3, seed=0)
    dp = DetectorTrainer(model, lr=1e-3, seed=0, mesh_config=mc)

    data = [synthetic_detection_batch(np.random.default_rng(i), 8, 64, max_gt=2)
            for i in range(4)]
    images = np.stack([d[0] for d in data])
    boxes = np.stack([d[1] for d in data])
    valid = np.stack([d[2] for d in data])
    out_s = single.train_steps_scan(images, boxes, valid)
    out_d = dp.train_steps_scan(images, boxes, valid)
    np.testing.assert_allclose(out_s["losses"], out_d["losses"], rtol=5e-3)


def test_qat_finetune_on_mesh_matches_single_device(rng):
    """DP QAT fine-tuning (train/qat.py mesh_config): loss trajectory over
    the 8-device data axis matches single-device. Fake-quant rounding
    boundaries amplify reduction-order noise, so tolerance is loss-level."""
    import jax.numpy as jnp

    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.models.detector_int8 import prepare_qat
    from cvsd_tpu.train.detector_train import synthetic_detection_batch
    from cvsd_tpu.train.qat import QATFineTuner

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           dtype=jnp.float32)
    variables = model.init_variables(__import__("jax").random.PRNGKey(0))
    calib = [synthetic_detection_batch(np.random.default_rng(9), 4, 64)[0]]
    qat_model, qat_vars = prepare_qat(model, variables, calib)

    cfg = get_default_config()
    mc = MeshConfig.from_config(cfg)
    single = QATFineTuner(qat_model, qat_vars, lr=1e-4)
    dp = QATFineTuner(qat_model, qat_vars, lr=1e-4, mesh_config=mc)

    data = [synthetic_detection_batch(np.random.default_rng(i), 8, 64, max_gt=2)
            for i in range(2)]
    for images, boxes, valid in data:
        m_s = single.train_step(images, boxes, valid)
        m_d = dp.train_step(images, boxes, valid)
        np.testing.assert_allclose(m_s["loss"], m_d["loss"], rtol=2e-3)

    out_s = single.train_steps_scan(
        np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
        np.stack([d[2] for d in data]))
    out_d = dp.train_steps_scan(
        np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
        np.stack([d[2] for d in data]))
    np.testing.assert_allclose(out_s["losses"], out_d["losses"], rtol=5e-3)


def test_topdown_pose_on_mesh_matches_single_device(rng):
    """DP inference with the fused top-down pose stage: kpts from the sharded
    pipeline match single-device (crop gathers are per-example, so batch
    sharding commutes with the pose net)."""
    cfg = get_default_config()
    cfg["detector"].update(img_size=64, width_mult=0.25, depth_mult=0.34,
                           batch_size=8, conf_threshold=0.0, max_detections=4,
                           dtype="float32", pose_mode="topdown",
                           pose_topdown={"num_keypoints": 17, "width": 8, "crop_size": 32})
    single = DetectionPipeline(cfg)
    mc = MeshConfig.from_config(cfg)
    sharded = DetectionPipeline(cfg, variables=single.variables, mesh_config=mc,
                                pose_model=single.pose_model,
                                pose_variables=single.pose_variables)
    frames = rng.integers(0, 255, (8, 48, 64, 3)).astype(np.uint8)
    out_s = single.detect_frames(frames)
    out_m = sharded.detect_frames(frames)
    assert len(out_s) == 5 and len(out_m) == 5
    for a, b in zip(out_s, out_m):
        np.testing.assert_allclose(a, b, atol=2e-3)

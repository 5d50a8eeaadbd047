import jax.numpy as jnp
import numpy as np
import pytest

from cvsd_tpu.models.detector import PersonDetector, make_detect_fn
from cvsd_tpu.ops.iou import box_iou_matrix
from cvsd_tpu.train.detector_train import (
    DetectorTrainer,
    anchor_centers,
    assign_targets,
    synthetic_detection_batch,
)


def test_anchor_centers():
    centers, strides = anchor_centers(64)
    assert centers.shape == (8 * 8 + 4 * 4 + 2 * 2, 2)
    assert strides.min() == 8 and strides.max() == 32
    np.testing.assert_allclose(centers[0], [4.0, 4.0])  # first stride-8 cell


def test_assign_targets_center_sampling():
    centers, strides = anchor_centers(64)
    gt = jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [0, 0, 0, 0]]])
    valid = jnp.asarray([[True, False]])
    pos, target, _ = assign_targets(jnp.asarray(gt), valid, jnp.asarray(centers), jnp.asarray(strides))
    pos = np.asarray(pos[0])
    assert pos.any()
    # every positive anchor center is inside the GT box
    c = centers[pos]
    assert np.all((c[:, 0] >= 8) & (c[:, 0] <= 40) & (c[:, 1] >= 8) & (c[:, 1] <= 40))
    # and its target is the GT box
    np.testing.assert_allclose(np.asarray(target[0])[pos], [[8, 8, 40, 40]] * pos.sum())


def test_assign_prefers_smaller_gt():
    centers, strides = anchor_centers(64)
    big = [0.0, 0.0, 64.0, 64.0]
    small = [24.0, 24.0, 40.0, 40.0]
    gt = jnp.asarray([[big, small]])
    valid = jnp.asarray([[True, True]])
    pos, target, _ = assign_targets(gt, valid, jnp.asarray(centers), jnp.asarray(strides))
    # the anchor at the dead center (32, 32) must target the small box
    idx = int(np.argmin(np.abs(centers - 32).sum(1)))
    assert bool(np.asarray(pos[0])[idx])
    np.testing.assert_allclose(np.asarray(target[0])[idx], small)


def test_kpt_target_consistent_with_box_assignment():
    """Regression (ADVICE r1, medium): in crowded scenes the keypoint target
    must come from the SAME GT as the box target / scale normalizer, i.e. the
    inside-and-centered assignment — not a separate inside-only matching."""
    from cvsd_tpu.models.detector import decode_predictions
    from cvsd_tpu.train.detector_train import detection_loss

    centers, strides = anchor_centers(64)
    centers_j, strides_j = jnp.asarray(centers), jnp.asarray(strides)
    # anchor (4,4): inside both boxes; centered only w.r.t. big; small has
    # smaller area -> inside-only min-area would pick small, box assignment big
    big = [0.0, 0.0, 32.0, 32.0]
    small = [0.0, 0.0, 8.0, 64.0]
    gt = jnp.asarray([[big, small]])
    valid = jnp.asarray([[True, True]])
    K = 3
    rng = np.random.default_rng(0)
    gt_kpts = jnp.asarray(rng.uniform(0, 64, (1, 2, K, 2)).astype(np.float32))
    raw = {
        name: jnp.asarray(rng.normal(size=(1, 64 // s, 64 // s, 5 + 3 * K)).astype(np.float32))
        for name, s in zip(("p3", "p4", "p5"), (8, 16, 32))
    }
    _, aux = detection_loss(raw, gt, valid, 64, centers_j, strides_j,
                            gt_kpts=gt_kpts, num_keypoints=K)

    pos, target, gt_idx = assign_targets(gt, valid, centers_j, strides_j)
    # the geometry really exercises the divergence: inside-only min-area
    # disagrees with the box assignment on some positive anchor
    inside = (
        (centers_j[None, :, None, 0] >= gt[:, None, :, 0])
        & (centers_j[None, :, None, 0] <= gt[:, None, :, 2])
        & (centers_j[None, :, None, 1] >= gt[:, None, :, 1])
        & (centers_j[None, :, None, 1] <= gt[:, None, :, 3])
    )
    area = (gt[:, None, :, 2] - gt[:, None, :, 0]) * (gt[:, None, :, 3] - gt[:, None, :, 1])
    inside_idx = jnp.argmin(jnp.where(inside, area, jnp.inf), axis=-1)
    assert bool(jnp.any(pos & (inside_idx != gt_idx)))

    # reference kpt loss computed from the box assignment's gt_idx
    _, _, pred_kpts = decode_predictions(raw, 64, K)
    tk = jnp.take_along_axis(gt_kpts, gt_idx[:, :, None, None], axis=1)
    scale = jnp.maximum(target[..., 2] - target[..., 0], 1.0)[..., None, None]
    err = jnp.sum(((pred_kpts[..., :2] - tk) / scale) ** 2, axis=(-1, -2))
    ref = jnp.sum(jnp.where(pos, err, 0.0)) / jnp.maximum(pos.sum(), 1.0)
    np.testing.assert_allclose(float(aux["kpt_loss"]), float(ref), rtol=1e-5)


@pytest.mark.slow
def test_pose_head_training_step():
    rng = np.random.default_rng(0)
    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           num_keypoints=5, dtype=jnp.float32)
    trainer = DetectorTrainer(model, lr=3e-3)
    first = None
    for _ in range(12):
        images, boxes, valid, kpts = synthetic_detection_batch(rng, 8, 64, num_keypoints=5)
        out = trainer.train_step(images, boxes, valid, kpts)
        if first is None:
            first = out
    assert "kpt_loss" in out and np.isfinite(out["kpt_loss"])
    assert out["loss"] < first["loss"]


@pytest.mark.slow
def test_detector_training_learns_rectangles():
    rng = np.random.default_rng(0)
    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34, dtype=jnp.float32)
    trainer = DetectorTrainer(model, lr=3e-3)
    first_loss, last = None, None
    for i in range(60):
        images, boxes, valid = synthetic_detection_batch(rng, 8, 64)
        out = trainer.train_step(images, boxes, valid)
        if first_loss is None:
            first_loss = out["loss"]
        last = out
    assert np.isfinite(last["loss"])
    assert last["loss"] < first_loss * 0.7, (first_loss, last)

    # the trained detector should now localize a rectangle
    detect = make_detect_fn(model, conf_thresh=0.3, max_detections=8, use_pallas=False)
    images, boxes, valid = synthetic_detection_batch(np.random.default_rng(1), 4, 64, max_gt=1)
    ob, os_, ov = detect(trainer.variables, jnp.asarray(images))
    hits = 0
    for b in range(4):
        det = np.asarray(ob[b][np.asarray(ov[b])])
        if len(det) == 0:
            continue
        iou = np.asarray(box_iou_matrix(jnp.asarray(det), jnp.asarray(boxes[b][:1])))
        if iou.max() > 0.5:
            hits += 1
    assert hits >= 2, f"only {hits}/4 rectangles localized"


def test_v8dfl_head_trains():
    """Fine-tune path for imported ultralytics-u heads: loss decreases and
    the trained v8dfl model detects the synthetic rectangles."""
    import jax.numpy as jnp

    from cvsd_tpu.models.detector import PersonDetector, make_detect_fn
    from cvsd_tpu.train.detector_train import DetectorTrainer, synthetic_detection_batch

    rng = np.random.default_rng(0)
    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           head_variant="v8dfl", dtype=jnp.float32)
    trainer = DetectorTrainer(model, lr=2e-3)
    first = last = None
    for i in range(30):
        images, boxes, valid = synthetic_detection_batch(rng, 8, 64, max_gt=2)
        m = trainer.train_step(images, boxes, valid)
        if i == 0:
            first = m["loss"]
        last = m["loss"]
    assert last < first * 0.8, (first, last)

    detect = make_detect_fn(model, conf_thresh=0.2, max_detections=4)
    images, boxes, valid = synthetic_detection_batch(rng, 4, 64, max_gt=1)
    out_boxes, out_scores, out_valid = detect(trainer.variables, jnp.asarray(images))
    assert np.asarray(out_valid).any()  # finds something after 30 steps


def test_ema_matches_numpy_reference():
    """The trainer's EMA equals the ramped-decay recursion computed in NumPy
    from the per-step parameter trajectory (exact math, not cross-program
    trajectory comparison — differently-fused Adam programs drift)."""
    import jax

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34, dtype=jnp.float32)
    decay = 0.9
    tr = DetectorTrainer(model, lr=3e-3, seed=0, ema_decay=decay)
    data = [synthetic_detection_batch(np.random.default_rng(i), 8, 64) for i in range(4)]
    expected = None
    for t, (images, boxes, valid) in enumerate(data):
        tr.train_step(images, boxes, valid)
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr.variables["params"])]
        d = min(decay, (1.0 + t) / (10.0 + t))
        if expected is None:
            expected = leaves  # d applies to the pre-step ema == init... see below
            init = [np.asarray(x) for x in jax.tree_util.tree_leaves(
                DetectorTrainer(model, lr=3e-3, seed=0).variables["params"])]
            expected = [e * d + p * (1 - d) for e, p in zip(init, leaves)]
        else:
            expected = [e * d + p * (1 - d) for e, p in zip(expected, leaves)]
    for e, a in zip(expected, jax.tree_util.tree_leaves(tr.ema_params)):
        np.testing.assert_allclose(e, np.asarray(a), atol=1e-5)
    # ema_variables is a drop-in for eval
    detect = make_detect_fn(model, conf_thresh=0.3, max_detections=8, use_pallas=False)
    out = detect(tr.ema_variables, jnp.asarray(data[0][0]))
    assert np.isfinite(np.asarray(out[1])).all()


def test_ema_scan_path_invariant():
    """With lr=0 the parameters never move, so the scan path's EMA must equal
    them exactly — catches any EMA/carry wiring bug independent of Adam noise."""
    import jax

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34, dtype=jnp.float32)
    tr = DetectorTrainer(model, lr=0.0, seed=0, ema_decay=0.9)
    data = [synthetic_detection_batch(np.random.default_rng(i), 4, 64) for i in range(3)]
    tr.train_steps_scan(np.stack([d[0] for d in data]), np.stack([d[1] for d in data]),
                        np.stack([d[2] for d in data]))
    for a, b in zip(jax.tree_util.tree_leaves(tr.ema_params),
                    jax.tree_util.tree_leaves(tr.variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert tr._ema_t == 3


def test_ema_off_by_default():
    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34, dtype=jnp.float32)
    tr = DetectorTrainer(model, lr=1e-3)
    assert tr.ema_params is None
    assert tr.ema_variables is tr.variables


def test_detector_checkpoint_roundtrip(tmp_path):
    """save -> load_detector_checkpoint rebuilds the model and reproduces
    detections exactly (EMA weights persisted by default)."""
    import jax

    from cvsd_tpu.models.detector import load_detector_checkpoint

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           num_keypoints=5, dtype=jnp.float32)
    tr = DetectorTrainer(model, lr=3e-3, seed=0, ema_decay=0.9)
    images, boxes, valid, kpts = synthetic_detection_batch(
        np.random.default_rng(0), 4, 64, num_keypoints=5)
    tr.train_step(images, boxes, valid, kpts)
    path = str(tmp_path / "det.msgpack")
    tr.save(path, steps=1)

    model2, variables2, meta = load_detector_checkpoint(path)
    assert model2.img_size == 64 and model2.num_keypoints == 5
    assert meta["steps"] == 1
    detect = make_detect_fn(model, conf_thresh=0.3, max_detections=4, use_pallas=False)
    detect2 = make_detect_fn(model2, conf_thresh=0.3, max_detections=4, use_pallas=False)
    out1 = detect(tr.ema_variables, jnp.asarray(images))
    out2 = detect2(variables2, jnp.asarray(images))
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

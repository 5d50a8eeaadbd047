import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvsd_tpu.models.detector import PersonDetector, decode_predictions, make_detect_fn
from cvsd_tpu.ops import (
    batched_nms,
    box_iou_matrix,
    letterbox_batch,
    letterbox_params,
    nms_jax,
    nms_pallas,
    xywh_to_xyxy,
    xyxy_to_xywhn,
)
from cvsd_tpu.ops.letterbox import PAD_VALUE, unletterbox_boxes


# ---------- box utils ----------

def test_box_conversions_roundtrip(rng):
    xywh = np.abs(rng.normal(size=(10, 4))) + 0.1
    xyxy = np.asarray(xywh_to_xyxy(jnp.asarray(xywh)))
    assert np.all(xyxy[:, 2] >= xyxy[:, 0])
    n = np.asarray(xyxy_to_xywhn(jnp.asarray(xyxy), 640.0, 480.0))
    np.testing.assert_allclose(n[:, 0] * 640, xywh[:, 0], rtol=1e-5)
    np.testing.assert_allclose(n[:, 3] * 480, xywh[:, 3], rtol=1e-5)


def test_iou_matrix_known_values():
    a = jnp.asarray([[0, 0, 10, 10], [0, 0, 5, 5]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_iou_matrix(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25 / 175, rtol=1e-5)
    np.testing.assert_allclose(iou[0, 2], 0.0)
    np.testing.assert_allclose(iou[1, 1], 0.0)


# ---------- NMS ----------

def _numpy_greedy_nms(boxes, scores, iou_t):
    """Plain O(n^2) reference (boxes sorted by desc score)."""
    n = len(boxes)
    keep = np.ones(n, bool)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if not keep[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a1 + a2 - inter, 1e-9) > iou_t:
                keep[j] = False
    return keep


@pytest.fixture
def random_boxes(rng):
    n = 64
    cxy = rng.uniform(50, 590, (n, 2))
    wh = rng.uniform(20, 120, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1.0, n).astype(np.float32))[::-1].copy()
    return boxes, scores


def test_nms_jax_matches_numpy(random_boxes):
    boxes, scores = random_boxes
    keep = np.asarray(nms_jax(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    expected = _numpy_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, expected)


def test_nms_pallas_multi_matches_jax(random_boxes):
    from cvsd_tpu.ops.nms import nms_pallas_multi

    boxes, scores = random_boxes
    B = 5
    bb = np.stack([boxes + i for i in range(B)])
    keep = np.asarray(nms_pallas_multi(jnp.asarray(bb), jnp.ones((B, len(boxes)), jnp.float32),
                                       0.45, group=2)) > 0.5
    for b in range(B):
        ref = np.asarray(nms_jax(jnp.asarray(bb[b]), jnp.asarray(scores), 0.45))
        np.testing.assert_array_equal(keep[b], ref)


def test_nms_fixpoint_matches_greedy(random_boxes):
    """Jacobi fixpoint NMS (XLA + Pallas) is exactly greedy NMS."""
    from cvsd_tpu.ops.nms import nms_fixpoint_jax, nms_pallas_fixpoint

    boxes, scores = random_boxes
    B = 5
    bb = np.stack([boxes + 7 * i for i in range(B)])
    alive = np.ones((B, len(boxes)), np.float32)
    ref = np.stack([
        np.asarray(nms_jax(jnp.asarray(bb[b]), jnp.asarray(scores), 0.45)) for b in range(B)
    ])
    fp = np.asarray(nms_fixpoint_jax(jnp.asarray(bb), jnp.asarray(alive), 0.45))
    np.testing.assert_array_equal(fp, ref)
    pf = np.asarray(nms_pallas_fixpoint(jnp.asarray(bb), jnp.asarray(alive), 0.45, group=2))
    np.testing.assert_array_equal(pf, ref)


def test_nms_fixpoint_adversarial_chain():
    """Depth-K suppression chain (each box overlaps only its neighbor) — the
    worst case for fixpoint iteration: greedy keeps every other box."""
    from cvsd_tpu.ops.nms import nms_fixpoint_jax, nms_pallas_fixpoint

    K = 64
    boxes = np.zeros((1, K, 4), np.float32)
    for i in range(K):
        boxes[0, i] = [i * 6.0, 0.0, i * 6.0 + 10.0, 10.0]  # neighbor IoU = 0.25
    alive = np.ones((1, K), np.float32)
    ref = np.asarray(nms_jax(jnp.asarray(boxes[0]), jnp.ones(K), 0.2))
    assert ref.sum() == K // 2  # alternating keep
    fp = np.asarray(nms_fixpoint_jax(jnp.asarray(boxes), jnp.asarray(alive), 0.2))[0]
    np.testing.assert_array_equal(fp, ref)
    pf = np.asarray(nms_pallas_fixpoint(jnp.asarray(boxes), jnp.asarray(alive), 0.2, group=1))[0]
    np.testing.assert_array_equal(pf, ref)


def test_nms_fixpoint_respects_initial_dead():
    """Conf-dead candidates never suppress anyone."""
    from cvsd_tpu.ops.nms import nms_fixpoint_jax

    # box 0 dead (conf-filtered), overlaps box 1 heavily; box 1 must survive
    boxes = jnp.asarray([[[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]]], jnp.float32)
    alive = jnp.asarray([[0.0, 1.0, 1.0]])
    keep = np.asarray(nms_fixpoint_jax(boxes, alive, 0.45))[0]
    np.testing.assert_array_equal(keep, [False, True, True])


def test_batched_nms_method_equivalence(random_boxes):
    """All four batched_nms methods produce identical outputs."""
    boxes, _ = random_boxes
    B = 3
    bb = jnp.asarray(np.stack([boxes + 11 * i for i in range(B)]))
    rng = np.random.default_rng(3)
    sc = jnp.asarray(rng.uniform(size=(B, len(boxes))).astype(np.float32))
    outs = {}
    for m in ["xla", "fixpoint", "pallas_seq", "pallas_fixpoint"]:
        outs[m] = [np.asarray(o) for o in batched_nms(
            bb, sc, conf_thresh=0.25, iou_thresh=0.45, max_detections=16, pre_topk=32, method=m)]
    ref = outs["xla"]
    for m, o in outs.items():
        for a, b in zip(ref, o):
            np.testing.assert_allclose(a, b, err_msg=f"method {m}")


def test_nms_pallas_matches_jax(random_boxes):
    boxes, scores = random_boxes
    keep_ref = np.asarray(nms_jax(jnp.asarray(boxes), jnp.asarray(scores), 0.45))
    keep_pl = np.asarray(
        nms_pallas(jnp.asarray(boxes)[None], jnp.ones((1, len(boxes)), jnp.float32), 0.45)
    )[0] > 0.5
    np.testing.assert_array_equal(keep_pl, keep_ref)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_batched_nms_end_to_end(use_pallas):
    # two identical high-score boxes + one distinct -> 2 detections
    boxes = jnp.asarray(
        [[[10, 10, 50, 50], [12, 12, 52, 52], [200, 200, 240, 240], [0, 0, 1, 1]]], jnp.float32
    )
    scores = jnp.asarray([[0.9, 0.85, 0.8, 0.1]], jnp.float32)
    out_boxes, out_scores, valid, anchor_idx = batched_nms(
        boxes, scores, conf_thresh=0.25, iou_thresh=0.45, max_detections=8,
        pre_topk=4, use_pallas=use_pallas,
    )
    assert int(valid.sum()) == 2
    kept = np.asarray(out_scores[0][np.asarray(valid[0])])
    np.testing.assert_allclose(sorted(kept, reverse=True), [0.9, 0.8], atol=1e-6)
    kept_idx = set(np.asarray(anchor_idx[0][np.asarray(valid[0])]).tolist())
    assert kept_idx == {0, 2}


def test_nms_all_overlapping_keeps_one():
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (32, 1))
    boxes += np.random.default_rng(0).normal(0, 0.5, boxes.shape).astype(np.float32)
    scores = np.linspace(0.9, 0.5, 32, dtype=np.float32)
    keep = np.asarray(nms_jax(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert keep.sum() == 1 and keep[0]


def test_nms_none_above_confidence():
    boxes = jnp.asarray([[[0, 0, 10, 10], [20, 20, 30, 30]]], jnp.float32)
    scores = jnp.asarray([[0.1, 0.05]], jnp.float32)
    ob, os_, valid, _ = batched_nms(boxes, scores, conf_thresh=0.5, pre_topk=2,
                                    max_detections=4, use_pallas=False)
    assert int(valid.sum()) == 0
    np.testing.assert_array_equal(np.asarray(ob), 0.0)


def test_nms_zero_area_boxes_safe():
    boxes = jnp.asarray([[[5, 5, 5, 5], [0, 0, 10, 10]]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8]], jnp.float32)
    ob, os_, valid, _ = batched_nms(boxes, scores, conf_thresh=0.1, pre_topk=2,
                                    max_detections=4, use_pallas=False)
    assert int(valid.sum()) == 2  # degenerate box has IoU 0 with everything
    assert np.all(np.isfinite(np.asarray(os_)))


# ---------- letterbox ----------

def test_letterbox_geometry():
    scale, pad_x, pad_y, new_w, new_h = letterbox_params(480, 640, 640)
    assert scale == 1.0 and new_w == 640 and new_h == 480
    assert pad_x == 0 and pad_y == 80


def test_letterbox_batch_values(rng):
    frames = rng.integers(0, 255, (2, 480, 640, 3)).astype(np.uint8)
    out = np.asarray(letterbox_batch(jnp.asarray(frames), size=640, dtype=jnp.float32))
    assert out.shape == (2, 640, 640, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_allclose(out[:, :80], PAD_VALUE / 255.0, atol=1e-5)  # top pad
    np.testing.assert_allclose(out[:, -80:], PAD_VALUE / 255.0, atol=1e-5)  # bottom pad
    # interior matches the source (no resize needed at this geometry)
    np.testing.assert_allclose(out[:, 80:560], frames / 255.0, atol=1e-5)


def test_unletterbox_roundtrip():
    boxes = jnp.asarray([[100.0, 160.0, 300.0, 400.0]])
    back = np.asarray(unletterbox_boxes(boxes, 480, 640, 640))
    np.testing.assert_allclose(back, [[100.0, 80.0, 300.0, 320.0]], atol=1e-5)


# ---------- detector ----------

@pytest.fixture(scope="module")
def tiny_detector():
    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34, dtype=jnp.float32)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def test_detector_level_shapes(tiny_detector):
    model, variables = tiny_detector
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    raw = model.apply(variables, x, train=False)
    assert raw["p3"].shape == (2, 8, 8, 5)
    assert raw["p4"].shape == (2, 4, 4, 5)
    assert raw["p5"].shape == (2, 2, 2, 5)


def test_decode_ranges(tiny_detector):
    model, variables = tiny_detector
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    raw = model.apply(variables, x, train=False)
    boxes, scores, kpts = decode_predictions(raw, 64)
    assert boxes.shape == (1, 8 * 8 + 4 * 4 + 2 * 2, 4)
    assert scores.shape == (1, 84)
    b, s = np.asarray(boxes), np.asarray(scores)
    assert np.all(s >= 0) and np.all(s <= 1)
    assert np.all(b[..., 2] >= b[..., 0]) and np.all(b[..., 3] >= b[..., 1])
    assert kpts is None


def test_detect_fn_runs(tiny_detector):
    model, variables = tiny_detector
    detect = make_detect_fn(model, conf_thresh=0.0, max_detections=16)
    images = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    out_boxes, out_scores, valid = detect(variables, images)
    assert out_boxes.shape == (2, 16, 4)
    assert out_scores.shape == (2, 16)
    assert bool(valid.any())


def test_detector_pose_head():
    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           num_keypoints=17, dtype=jnp.float32)
    variables = model.init_variables(jax.random.PRNGKey(0))
    detect = make_detect_fn(model, conf_thresh=0.0, max_detections=8)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out_boxes, out_scores, valid, kpts = detect(variables, images)
    assert kpts.shape == (1, 8, 17, 3)


def test_flip_anchor_permutation_mirrors_centers():
    from cvsd_tpu.models.detector import flip_anchor_permutation
    from cvsd_tpu.train.detector_train import anchor_centers

    S = 64
    centers, strides = anchor_centers(S)
    perm = flip_anchor_permutation(S, S)
    # the permuted partner sees the horizontally mirrored location
    np.testing.assert_allclose(centers[perm, 0], S - centers[:, 0], atol=1e-5)
    np.testing.assert_allclose(centers[perm, 1], centers[:, 1], atol=1e-5)
    np.testing.assert_array_equal(strides[perm], strides)
    assert (perm[perm] == np.arange(len(perm))).all()  # involution


def test_tta_flip_detect_is_mirror_equivariant():
    """detect(tta_flip=True) on [img, flip(img)] returns mirrored results for
    the two rows — exact by construction for ANY weights, so random init
    suffices. Covers the anchor permutation, x -> S-x unflip and the COCO
    left/right keypoint swap end-to-end through NMS."""
    import jax
    import jax.numpy as jnp

    from cvsd_tpu.data.augment import flip_permutation
    from cvsd_tpu.models.detector import PersonDetector, make_detect_fn

    S = 64
    model = PersonDetector(img_size=S, width_mult=0.25, depth_mult=0.34,
                           num_keypoints=5, dtype=jnp.float32)
    variables = model.init_variables(jax.random.PRNGKey(3))
    img = jax.random.uniform(jax.random.PRNGKey(4), (1, S, S, 3))
    batch = jnp.concatenate([img, img[:, :, ::-1, :]], axis=0)
    detect = make_detect_fn(model, conf_thresh=0.0, iou_thresh=0.45,
                            max_detections=8, use_pallas=False, tta_flip=True)
    boxes, scores, valid, kpts = detect(variables, batch)
    b0, b1 = np.asarray(boxes[0]), np.asarray(boxes[1])
    np.testing.assert_allclose(np.asarray(scores[0]), np.asarray(scores[1]), atol=1e-4)
    keep = np.asarray(valid[0])
    np.testing.assert_allclose(b1[keep, 0], S - b0[keep, 2], atol=1e-2)
    np.testing.assert_allclose(b1[keep, 2], S - b0[keep, 0], atol=1e-2)
    np.testing.assert_allclose(b1[keep, 1], b0[keep, 1], atol=1e-2)
    kperm = flip_permutation(5)
    k0, k1 = np.asarray(kpts[0]), np.asarray(kpts[1])
    np.testing.assert_allclose(k1[keep][:, kperm, 0], S - k0[keep][:, :, 0], atol=1e-2)
    np.testing.assert_allclose(k1[keep][:, kperm, 1], k0[keep][:, :, 1], atol=1e-2)

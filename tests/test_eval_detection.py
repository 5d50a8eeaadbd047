"""Detection PR/AP evaluation golden tests."""

import numpy as np

from cvsd_tpu.eval.detection import detection_pr, keypoint_rms, match_detections


def test_match_detections_greedy():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    pred = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30], [50, 50, 60, 60]],
                    np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    tp, ss, ng = match_detections(pred, scores, gt, 0.5)
    assert ng == 2
    # highest-scoring overlap wins; duplicate becomes FP
    np.testing.assert_array_equal(tp, [True, False, True, False])


def test_detection_pr_perfect():
    gt = [np.array([[0, 0, 10, 10]], np.float32)]
    res = detection_pr(gt, [np.array([0.9], np.float32)], gt)
    assert res["ap"] == 1.0 and res["num_gt"] == 1


def test_detection_pr_hand_computed():
    """2 GT, 3 preds: TP(0.9), FP(0.8), TP(0.7).
    PR points: (r=.5, p=1), (r=.5, p=.5), (r=1, p=2/3).
    AP = .5*1 + .5*(2/3) = 5/6."""
    gt = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)]
    preds = [np.array([[0, 0, 10, 10], [40, 40, 50, 50], [20, 20, 30, 30]], np.float32)]
    scores = [np.array([0.9, 0.8, 0.7], np.float32)]
    res = detection_pr(preds, scores, gt)
    np.testing.assert_allclose(res["ap"], 5 / 6, rtol=1e-6)


def test_detection_pr_misses_and_empty_images():
    gt = [np.array([[0, 0, 10, 10]], np.float32), np.zeros((0, 4), np.float32)]
    preds = [np.zeros((0, 4), np.float32), np.array([[5, 5, 15, 15]], np.float32)]
    scores = [np.zeros(0, np.float32), np.array([0.4], np.float32)]
    res = detection_pr(preds, scores, gt)
    assert res["ap"] == 0.0 and res["num_gt"] == 1 and res["num_pred"] == 1


def test_keypoint_rms():
    pred = np.zeros((2, 3, 2)); gt = np.ones((2, 3, 2)) * 3.0  # err 3*sqrt2 px
    boxes = np.array([[0, 0, 10, 10], [0, 0, 20, 20]], np.float32)
    r = keypoint_rms(pred, gt, boxes)
    np.testing.assert_allclose(r["rms_px"], 3 * np.sqrt(2), rtol=1e-6)
    assert r["n"] == 2


def test_evaluate_detector_on_oracle():
    """An oracle detect_fn that returns the GT gets AP 1.0."""
    from cvsd_tpu.eval.detection import evaluate_detector
    import jax.numpy as jnp

    B, P = 4, 2
    rng = np.random.default_rng(0)
    gt_boxes = np.zeros((B, P, 4), np.float32)
    gt_valid = np.zeros((B, P), bool)
    for b in range(B):
        for p in range(rng.integers(1, P + 1)):
            x, y = rng.uniform(0, 50, 2)
            gt_boxes[b, p] = [x, y, x + 20, y + 20]
            gt_valid[b, p] = True
    images = np.zeros((B, 8, 8, 3), np.float32)

    def oracle(variables, imgs):
        n = imgs.shape[0]
        boxes = np.zeros((n, P, 4), np.float32)
        scores = np.zeros((n, P), np.float32)
        valid = np.zeros((n, P), bool)
        boxes[:B] = gt_boxes[:n]
        scores[:B] = np.where(gt_valid[:n], 0.9, 0.0)
        valid[:B] = gt_valid[:n]
        return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)

    res = evaluate_detector(oracle, None, images, gt_boxes, gt_valid, batch_size=4)
    assert res["ap"] == 1.0

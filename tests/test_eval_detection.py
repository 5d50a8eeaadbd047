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


def test_detection_map_perfect_and_degrading():
    """Perfect boxes score 1.0 at every IoU threshold; a box with IoU ~0.68
    vs GT counts at 0.5-0.65 but not at 0.7+, so map50_95 lands between."""
    from cvsd_tpu.eval.detection import detection_map

    gt = [np.array([[0, 0, 10, 10]], np.float32)]
    res = detection_map(gt, [np.array([0.9], np.float32)], gt)
    assert res["map50"] == 1.0 and res["map75"] == 1.0 and res["map50_95"] == 1.0

    # pred [0,0,10,8.2] vs gt [0,0,10,10]: IoU = 82/100 = 0.82
    preds = [np.array([[0, 0, 10, 8.2]], np.float32)]
    res = detection_map(preds, [np.array([0.9], np.float32)], gt)
    assert res["per_iou"][0.5] == 1.0 and res["per_iou"][0.8] == 1.0
    assert res["per_iou"][0.85] == 0.0 and res["per_iou"][0.95] == 0.0
    # 7 of 10 thresholds pass (0.50..0.80)
    np.testing.assert_allclose(res["map50_95"], 0.7, rtol=1e-6)


def test_oks_matrix_and_pose_map():
    from cvsd_tpu.eval.detection import oks_matrix, pose_map

    K = 17
    gt_k = np.tile(np.linspace(10, 90, K)[:, None], (1, 2)).astype(np.float32)[None]
    gt_b = np.array([[0, 0, 100, 100]], np.float32)
    # exact keypoints -> OKS 1 -> perfect pose mAP
    oks = oks_matrix(gt_k, gt_k, np.array([10000.0]))
    np.testing.assert_allclose(oks, [[1.0]], rtol=1e-6)
    res = pose_map([gt_k], [np.array([0.9], np.float32)], [gt_k], [gt_b])
    assert res["pose_map50"] == 1.0 and res["pose_map50_95"] == 1.0
    # wildly wrong keypoints -> OKS ~0 -> zero pose mAP
    bad = gt_k + 500.0
    res = pose_map([bad], [np.array([0.9], np.float32)], [gt_k], [gt_b])
    assert res["pose_map50_95"] == 0.0


def test_pose_map_partial_credit():
    """Keypoints offset so OKS lands strictly between 0.5 and 0.95: counted
    at low thresholds, rejected at high ones."""
    from cvsd_tpu.eval.detection import oks_matrix, pose_map, COCO_KPT_SIGMAS

    K = 17
    gt_k = np.full((1, K, 2), 50.0, np.float32)
    gt_b = np.array([[0, 0, 100, 100]], np.float32)
    area = 10000.0
    # pick an offset giving mean OKS ~0.72: solve exp(-d2/(2*s*(2sig)^2))=0.72
    d = np.sqrt(-2 * area * (2 * COCO_KPT_SIGMAS[:K]) ** 2 * np.log(0.72))
    pred = gt_k.copy()
    pred[0, :, 0] += d
    oks = oks_matrix(pred, gt_k, np.array([area]))
    np.testing.assert_allclose(oks[0, 0], 0.72, rtol=1e-5)
    res = pose_map([pred], [np.array([0.9], np.float32)], [gt_k], [gt_b])
    assert res["per_oks"][0.5] == 1.0 and res["per_oks"][0.7] == 1.0
    assert res["per_oks"][0.75] == 0.0
    np.testing.assert_allclose(res["pose_map50_95"], 0.5, rtol=1e-6)


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

"""Metrics validated against sklearn (golden reference the repo's own
training_results.json metrics were computed with)."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score, f1_score, roc_auc_score

from cvsd_tpu.utils.metrics import (
    compute_auc_pr,
    compute_auc_roc,
    compute_metrics,
    compute_video_level_metrics,
    find_optimal_threshold,
)


@pytest.fixture
def labeled_scores(rng):
    n = 500
    labels = rng.integers(0, 2, size=n)
    scores = labels * 0.8 + rng.normal(0, 0.6, size=n)
    return labels, scores


def test_auc_roc_matches_sklearn(labeled_scores):
    labels, scores = labeled_scores
    auc, fpr, tpr = compute_auc_roc(labels, scores)
    assert auc == pytest.approx(roc_auc_score(labels, scores), abs=1e-9)
    assert fpr[0] == 0.0 and tpr[0] == 0.0
    assert fpr[-1] == 1.0 and tpr[-1] == 1.0


def test_auc_pr_matches_sklearn(labeled_scores):
    labels, scores = labeled_scores
    ap, precision, recall = compute_auc_pr(labels, scores)
    assert ap == pytest.approx(average_precision_score(labels, scores), abs=1e-9)
    assert recall[-1] == 0.0 and precision[-1] == 1.0


def test_single_class_is_safe():
    auc, _, _ = compute_auc_roc(np.zeros(10), np.arange(10))
    assert auc == 0.5
    # degenerate AUC-PR falls back to 0.0 (reference shopformer_2/utils/metrics.py:62-63)
    ap, _, _ = compute_auc_pr(np.ones(10), np.arange(10))
    assert ap == 0.0
    m = compute_metrics(np.zeros(10), np.arange(10.0))
    assert m["auc_roc"] == 0.5


def test_youden_threshold_separates(labeled_scores):
    labels, scores = labeled_scores
    t = find_optimal_threshold(labels, scores, "youden")
    pred = scores >= t
    acc = (pred == labels).mean()
    assert acc > 0.6  # clearly better than chance on this separable mixture


def test_f1_threshold_maximizes_f1(labeled_scores):
    labels, scores = labeled_scores
    t = find_optimal_threshold(labels, scores, "f1")
    f1_at_t = f1_score(labels, scores >= t)
    # compare against a grid of candidate thresholds
    for cand in np.quantile(scores, np.linspace(0.05, 0.95, 19)):
        assert f1_at_t >= f1_score(labels, scores >= cand) - 1e-9


def test_compute_metrics_keys(labeled_scores):
    labels, scores = labeled_scores
    m = compute_metrics(labels, scores)
    for k in ("auc_roc", "auc_pr", "accuracy", "precision", "recall", "f1", "threshold"):
        assert k in m
    assert 0.0 <= m["accuracy"] <= 1.0


def test_video_level_metrics(rng):
    # 6 videos x 10 windows; videos 0-2 normal, 3-5 anomalous
    video_ids = np.repeat(np.arange(6), 10)
    labels = np.repeat([0, 0, 0, 1, 1, 1], 10)
    scores = labels + rng.normal(0, 0.1, size=60)
    out = compute_video_level_metrics(labels, scores, video_ids)
    assert set(out) == {"max", "mean", "percentile_95"}
    for agg in out:
        assert out[agg]["auc_roc"] == pytest.approx(1.0)

"""Streaming GT-join evaluation tests."""

import numpy as np

from cvsd_tpu.data.ucf_crime import TemporalAnnotation
from cvsd_tpu.eval.streaming_eval import evaluate_streaming, join_events
from cvsd_tpu.pipeline.streaming import ScoreEvent


def _ev(video, score, frames):
    return ScoreEvent(video=video, track_id=1, frame_end=frames[-1],
                      timestamp_ms=0.0, score=score, frames=frames)


def _anns():
    return [
        TemporalAnnotation("Shoplifting001_x264.mp4", "Shoplifting", [(100, 200)]),
        TemporalAnnotation("Shoplifting002_x264.mp4", "Shoplifting", [(50, 80), (300, 400)]),
        TemporalAnnotation("Normal_Videos_003_x264.mp4", "Normal", []),
        TemporalAnnotation("Normal_Videos_004_x264.mp4", "Normal", []),
    ]


def test_join_normalizes_names():
    events = [_ev("Shoplifting001_x264.mp4", 0.9, [1, 2]),
              _ev("/tmp/vids/Normal_Videos_003_x264.mp4", 0.1, [3, 4]),
              _ev("Unknown_x264.mp4", 0.5, [1])]
    by_video, matched, unmatched = join_events(events, _anns())
    assert set(matched) == {"Shoplifting001_x264", "Normal_Videos_003_x264"}
    assert unmatched == ["Unknown_x264"]


def test_perfect_separation_auc_one():
    events = [
        _ev("Shoplifting001_x264.mp4", 0.9, [150, 160]),
        _ev("Shoplifting002_x264.mp4", 0.8, [60, 70]),
        _ev("Normal_Videos_003_x264.mp4", 0.2, [10, 20]),
        _ev("Normal_Videos_004_x264.mp4", 0.1, [10, 20]),
    ]
    res = evaluate_streaming(events, _anns(), n_boot=50)
    assert res.video_auc == 1.0 and res.event_auc == 1.0
    assert res.n_videos == 4 and res.n_events == 4
    assert res.video_auc_ci[0] <= 1.0 <= res.video_auc_ci[1] + 1e-9


def test_event_labels_use_frame_overlap():
    # same anomalous video: one window inside the range, one outside
    events = [
        _ev("Shoplifting001_x264.mp4", 0.9, [150, 155]),   # inside 100-200 -> label 1
        _ev("Shoplifting001_x264.mp4", 0.3, [500, 510]),   # outside -> label 0
        _ev("Normal_Videos_003_x264.mp4", 0.1, [10, 20]),  # label 0
    ]
    res = evaluate_streaming(events, _anns(), n_boot=0)
    assert res.event_auc == 1.0  # 0.9 (pos) above 0.3 and 0.1 (neg)


def test_eventless_videos_counted():
    """Annotated, streamed, but zero events -> score 0 at video level."""
    events = [_ev("Shoplifting001_x264.mp4", 0.9, [150])]
    res = evaluate_streaming(
        events, _anns(), n_boot=0,
        include_eventless_videos=["Normal_Videos_003_x264.mp4",
                                  "Shoplifting002_x264.mp4"])
    assert res.n_videos == 3
    assert res.per_video["Shoplifting002_x264"]["score"] == 0.0
    # labels [1, 0, 1] scores [0.9, 0, 0]: one positive scored 0 -> AUC 0.75
    np.testing.assert_allclose(res.video_auc, 0.75)


def test_aggregation_choice():
    events = [
        _ev("Shoplifting001_x264.mp4", 0.1, [150]),
        _ev("Shoplifting001_x264.mp4", 0.9, [160]),
        _ev("Normal_Videos_003_x264.mp4", 0.4, [10]),
        _ev("Normal_Videos_004_x264.mp4", 0.35, [10]),
    ]
    r_max = evaluate_streaming(events, _anns(), aggregation="max", n_boot=0)
    r_mean = evaluate_streaming(events, _anns(), aggregation="mean", n_boot=0)
    assert r_max.per_video["Shoplifting001_x264"]["score"] == 0.9
    np.testing.assert_allclose(r_mean.per_video["Shoplifting001_x264"]["score"], 0.5)
    assert r_max.video_auc == 1.0 and r_mean.video_auc == 1.0

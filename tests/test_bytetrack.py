"""ByteTrack-style tracker (track/bytetrack.py) and the tracker factory."""

import numpy as np
import pytest

from cvsd_tpu.track import ByteTracker, IoUTracker, make_tracker


def _box(cx, cy, w=20.0, h=40.0):
    return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], np.float32)


def test_kalman_predicts_constant_velocity():
    from cvsd_tpu.track.bytetrack import _Kalman, _to_cxcywh, _to_xyxy

    kf = _Kalman(_to_cxcywh(_box(100, 100)))
    # feed a few observations of steady +10px/frame motion
    for i in range(1, 6):
        kf.predict()
        kf.update(_to_cxcywh(_box(100 + 10 * i, 100)))
    pred = _to_xyxy(kf.predict())
    cx = (pred[0] + pred[2]) / 2
    assert abs(cx - 160) < 3  # next step extrapolated, not last position


def test_id_survives_occlusion_where_iou_fails():
    """A fast mover occluded for several frames: the stale-box IoU tracker
    cannot re-associate (zero overlap after the gap) and switches IDs; the
    Kalman tracker extrapolates through and keeps the ID."""
    # 8 px/frame on a 20 px-wide box: consecutive frames overlap (both
    # trackers follow), but a 5-frame occlusion opens a 40 px gap — zero IoU
    # against the IoU tracker's stale box, while the Kalman extrapolation
    # lands on the reappearance
    vx = 8.0
    frames = []
    for t in range(16):
        if 6 <= t < 11:
            frames.append((np.zeros((0, 4), np.float32), np.zeros(0, np.float32)))
        else:
            frames.append((_box(50 + vx * t, 100)[None], np.array([0.9], np.float32)))

    def run(tracker):
        ids = []
        for b, sc in frames:
            out = tracker.update_with_indices(b, sc)
            ids.extend(tid for tid, *_ in out)
        return ids

    iou_ids = run(IoUTracker())
    byte_ids = run(ByteTracker())
    assert len(set(iou_ids)) == 2, iou_ids  # IoU tracker loses the identity
    assert len(set(byte_ids)) == 1, byte_ids  # Kalman keeps it


def test_low_confidence_rescues_but_does_not_spawn():
    bt = ByteTracker(high_thresh=0.5, low_thresh=0.1)
    # frame 1: one high det -> track 1; a low det elsewhere must NOT spawn
    out = bt.update_with_indices(
        np.stack([_box(100, 100), _box(300, 300)]),
        np.array([0.9, 0.2], np.float32))
    assert [t for t, *_ in out] == [1]
    # frames 2-4: confidence dips below high_thresh -> byte stage keeps ID 1
    for i in range(1, 4):
        out = bt.update_with_indices(_box(100 + 2 * i, 100)[None],
                                     np.array([0.25], np.float32))
        assert [t for t, *_ in out] == [1]
    # recovery at high confidence: still ID 1
    out = bt.update_with_indices(_box(110, 100)[None], np.array([0.9], np.float32))
    assert [t for t, *_ in out] == [1]


def test_reported_boxes_are_detections_not_smoothed():
    bt = ByteTracker()
    b0 = _box(100, 100)
    bt.update_with_indices(b0[None], np.array([0.9], np.float32))
    b1 = _box(104, 100)
    out = bt.update_with_indices(b1[None], np.array([0.9], np.float32))
    np.testing.assert_allclose(out[0][1], b1, atol=1e-5)
    assert out[0][3] == 0  # detection index join intact


def test_make_tracker_factory():
    assert isinstance(make_tracker({}), IoUTracker)
    assert isinstance(make_tracker({"tracker": "byte"}), ByteTracker)
    t = make_tracker({"tracker": "byte", "tracker_max_misses": 5,
                      "tracker_high_thresh": 0.6})
    assert t.max_misses == 5 and t.high_thresh == 0.6
    with pytest.raises(ValueError):
        make_tracker({"tracker": "nope"})


def test_streaming_with_byte_tracker(tmp_path):
    """Full pipeline smoke with detector.tracker=byte: events produced and
    finite."""
    import jax

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.data.video import write_test_video
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.shopformer import build_shopformer
    from cvsd_tpu.pipeline.streaming import StreamingPipeline

    cfg = get_default_config()
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=8, conf_threshold=0.0, max_detections=4,
                           dtype="float32", pose_head=True, tracker="byte")
    cfg["model"]["hidden_channels"] = 8
    cfg["data"]["stride"] = 6
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)
    pipe = StreamingPipeline(cfg, scorer)
    video = write_test_video(str(tmp_path / "v.mp4"), num_frames=30,
                             width=320, height=240)
    events = list(pipe.stream_video(video))
    assert events and all(np.isfinite(e.score) for e in events)

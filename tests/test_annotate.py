"""Annotated-video output (viz/annotate.py)."""

import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.data.video import write_test_video
from cvsd_tpu.eval.evaluate import ShopformerScorer
from cvsd_tpu.models.shopformer import build_shopformer
from cvsd_tpu.pipeline.streaming import StreamingPipeline
from cvsd_tpu.viz.annotate import annotate_video, draw_detections

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    import jax

    cfg = get_default_config()
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=8, conf_threshold=0.0, max_detections=4,
                           dtype="float32", pose_head=True)
    cfg["model"]["hidden_channels"] = 8
    cfg["data"]["stride"] = 6
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)
    pipe = StreamingPipeline(cfg, scorer)
    video = write_test_video(str(tmp_path_factory.mktemp("av") / "v.mp4"),
                             num_frames=30, width=320, height=240)
    return pipe, video


def test_draw_detections_marks_pixels():
    frame = np.zeros((120, 160, 3), np.uint8)
    dets = [{"track_id": 3, "box": np.array([20, 20, 80, 100], np.float32),
             "score": 0.9,
             "kpts": np.tile(np.array([[50.0, 60.0]], np.float32), (17, 1))}]
    out = draw_detections(frame, dets, anomaly={3: 0.8}, threshold=0.5,
                          banner="f1")
    assert out is frame
    assert frame.sum() > 0
    # anomaly 0.8 vs threshold 0.5 -> red-dominant box color (BGR)
    top_edge = frame[20, 20:80]
    assert top_edge[:, 2].max() > top_edge[:, 1].max()


def test_draw_detections_green_below_threshold():
    frame = np.zeros((120, 160, 3), np.uint8)
    dets = [{"track_id": 1, "box": np.array([10, 30, 60, 90], np.float32),
             "score": 0.5, "kpts": None}]
    draw_detections(frame, dets, anomaly={1: 0.05}, threshold=0.5)
    top_edge = frame[30, 10:60]
    assert top_edge[:, 1].max() > top_edge[:, 2].max()


def test_on_frame_hook_reports_source_coords(pipeline):
    pipe, video = pipeline
    seen = []
    list(pipe.stream_video(video, on_frame=lambda n, t, d: seen.append((n, t, d))))
    assert seen, "hook never called"
    frame_nos = [n for n, _, _ in seen]
    assert frame_nos == sorted(frame_nos) and frame_nos[0] == 1
    with_dets = [d for _, _, d in seen if d]
    assert with_dets, "no frames had detections"
    for d in with_dets[0]:
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= x2 <= 320 + 1 and 0 <= y1 <= y2 <= 240 + 1
        if d["kpts"] is not None:
            assert d["kpts"].shape[1] >= 2


def test_annotate_video_writes_matching_frames(pipeline, tmp_path):
    pipe, video = pipeline
    out_path = str(tmp_path / "annotated.mp4")
    res = annotate_video(pipe, video, out_path, threshold=0.5)
    assert res["frames"] == 30
    cap = cv2.VideoCapture(out_path)
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 30
    # events from the annotated pass must match a plain streaming pass
    plain = list(pipe.stream_video(video))
    assert len(res["events"]) == len(plain)
    for a, b in zip(res["events"], plain):
        assert a["track_id"] == b.track_id and a["frame_end"] == b.frame_end
        np.testing.assert_allclose(a["score"], b.score, rtol=1e-5)


def test_annotate_detector_only(tmp_path):
    """cli.annotate without a Shopformer checkpoint: boxes + track IDs."""
    import json

    import jax
    import numpy as np

    from cvsd_tpu.cli.annotate import main
    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.train.detector_train import DetectorTrainer

    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           num_keypoints=0, dtype=np.float32)
    DetectorTrainer(model, lr=1e-3).save(str(tmp_path / "det.msgpack"),
                                         use_ema=False)
    from cvsd_tpu.data.video import write_test_video

    video = write_test_video(str(tmp_path / "v.mp4"), num_frames=12,
                             width=320, height=240)
    out_dir = str(tmp_path / "ann")
    summary = str(tmp_path / "s.json")
    main(["--detector_checkpoint", str(tmp_path / "det.msgpack"),
          "--videos", video, "--out-dir", out_dir, "--output", summary,
          "--set", "detector.conf_threshold=0.0",
          "--set", "detector.batch_size=4"])
    s = json.load(open(summary))
    assert s[video]["frames"] == 12
    cap = cv2.VideoCapture(s[video]["out_path"])
    assert cap.isOpened()
    cap.release()

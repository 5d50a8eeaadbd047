import os

import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.data.bbox_schema import BBOX_COLUMNS, BBox, append_bboxes, load_bbox_dataframe, read_bboxes
from cvsd_tpu.data.ucf_crime import (
    ANOMALY_CATEGORIES,
    read_temporal_annotations,
    read_train_list,
    route_csv,
)
from cvsd_tpu.data.video import VideoBatcher, video_info, write_test_video
from cvsd_tpu.pipeline import DetectionPipeline, preprocess_ucf_crime
from cvsd_tpu.track.tracker import IoUTracker, iou_matrix_np


# ---------- BBox CSV ----------

def test_bbox_csv_roundtrip(tmp_path):
    rows = [
        BBox(1, "Shoplifting001_x264.mp4", 1, 1.0, 0.5, 0.5, 0.1, 0.2, True, "Shoplifting"),
        BBox(1, "Shoplifting001_x264.mp4", 2, 2.0, 0.25, 0.75, 0.05, 0.1, True, "Shoplifting"),
    ]
    p = str(tmp_path / "out.csv")
    n = append_bboxes(p, rows)
    assert n == 2
    with open(p) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 2  # headerless append (reference skip_header=True)
    assert lines[0] == "1,Shoplifting001_x264.mp4,1,1.0,0.5,0.5,0.1,0.2,True,Shoplifting"
    back = read_bboxes(p)
    assert back == rows


def test_bbox_dataframe_cache(tmp_path):
    rows = [BBox(1, "v.mp4", 1, 1.0, 0.5, 0.5, 0.1, 0.2, False, "Shopping")]
    p = str(tmp_path / "normal.csv")
    append_bboxes(p, rows)
    df = load_bbox_dataframe(p, cache_dir=str(tmp_path / "cache"))
    assert list(df.columns) == list(BBOX_COLUMNS)
    assert df.iloc[0]["anomaly"] == "Shopping"
    # second load hits the cache
    df2 = load_bbox_dataframe(p, cache_dir=str(tmp_path / "cache"))
    assert len(df2) == 1


# ---------- UCF-Crime driver ----------

def test_anomaly_categories():
    assert len(ANOMALY_CATEGORIES) == 13
    assert "Shoplifting" in ANOMALY_CATEGORIES
    assert "Shopping" not in ANOMALY_CATEGORIES


def test_read_train_list_reference_file():
    entries = read_train_list("/root/reference/dataset/Anomaly_Train.txt")
    assert all(e.label in ("Shoplifting", "Shopping") for e in entries)
    assert len(entries) > 20
    # clip ids are positions in the FULL list (reference counter semantics)
    all_entries = read_train_list("/root/reference/dataset/Anomaly_Train.txt", None)
    assert len(all_entries) >= 1700
    by_path = {e.path: e.index for e in all_entries}
    for e in entries:
        assert by_path[e.path] == e.index


def test_route_csv(tmp_path):
    p, anomaly = route_csv("Shoplifting", str(tmp_path))
    assert anomaly and p.endswith("ucf-crime_dataset.csv")
    p, anomaly = route_csv("Shopping", str(tmp_path))
    assert not anomaly and p.endswith("ucf-crime_dataset-normal.csv")


def test_read_temporal_annotations():
    anns = read_temporal_annotations(
        "/root/reference/dataset/Temporal_Anomaly_Annotation_for_Testing_Videos.txt"
    )
    assert len(anns) > 100
    shoplifting = [a for a in anns if a.category == "Shoplifting"]
    assert shoplifting
    a = next(a for a in shoplifting if a.ranges)
    s, e = a.ranges[0]
    assert a.frame_label(s) == 1 and a.frame_label(e) == 1
    assert a.frame_label(0) == 0 or s == 0


# ---------- tracker ----------

def test_iou_matrix_np():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    m = iou_matrix_np(a, b)
    np.testing.assert_allclose(m, [[1.0, 0.0]])


def test_tracker_persistent_ids():
    tr = IoUTracker(iou_threshold=0.3)
    # two people moving slowly right
    ids_seen = []
    for t in range(10):
        boxes = np.array(
            [[10 + t, 10, 50 + t, 90], [200 + t, 20, 250 + t, 100]], np.float32
        )
        tracked = tr.update(boxes)
        ids = sorted(tid for tid, _, _ in tracked)
        ids_seen.append(ids)
    assert all(ids == ids_seen[0] for ids in ids_seen)  # stable IDs
    assert len(ids_seen[0]) == 2


def test_tracker_new_id_on_new_person():
    tr = IoUTracker()
    t1 = tr.update(np.array([[0, 0, 10, 10]], np.float32))
    t2 = tr.update(np.array([[0, 0, 10, 10], [500, 500, 520, 520]], np.float32))
    assert len(t2) == 2
    assert {tid for tid, _, _ in t2} > {tid for tid, _, _ in t1}


def test_tracker_survives_misses_and_reset():
    tr = IoUTracker(max_misses=3)
    (id1, _, _), = tr.update(np.array([[0, 0, 10, 10]], np.float32))
    tr.update(np.zeros((0, 4), np.float32))  # miss
    (id2, _, _), = tr.update(np.array([[1, 1, 11, 11]], np.float32))
    assert id2 == id1  # reassociated after one miss
    tr.reset()
    (id3, _, _), = tr.update(np.array([[0, 0, 10, 10]], np.float32))
    assert id3 == 1


# ---------- video ----------

@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("video") / "Shoplifting001_x264.mp4")
    return write_test_video(p, num_frames=40, width=320, height=240)


def test_video_batcher_native_ring_matches_queue(test_video):
    from cvsd_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    q_batches = list(VideoBatcher(test_video, batch_size=16, use_native_ring=False))
    n_batches = list(VideoBatcher(test_video, batch_size=16, use_native_ring=True))
    # default (None) auto-selects the native ring when the lib is built
    assert VideoBatcher(test_video, batch_size=16).use_native_ring
    assert len(q_batches) == len(n_batches)
    for a, b in zip(q_batches, n_batches):
        np.testing.assert_array_equal(a.frames, b.frames)
        np.testing.assert_array_equal(a.frame_numbers, b.frame_numbers)
        np.testing.assert_array_equal(a.mask, b.mask)


def test_video_info_and_batching(test_video):
    info = video_info(test_video)
    assert (info.width, info.height) == (320, 240)
    assert info.num_frames == 40
    batches = list(VideoBatcher(test_video, batch_size=16))
    assert len(batches) == 3
    assert batches[0].frames.shape == (16, 240, 320, 3)
    assert batches[0].mask.all()
    assert batches[2].mask.sum() == 8  # 40 - 32
    # frame numbers are 1-based and contiguous
    nums = np.concatenate([b.frame_numbers[b.mask] for b in batches])
    np.testing.assert_array_equal(nums, np.arange(1, 41))


# ---------- end-to-end preprocess ----------

@pytest.fixture(scope="module")
def ucf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ucf")
    (d / "Shoplifting").mkdir()
    (d / "Shopping").mkdir()
    write_test_video(str(d / "Shoplifting" / "Shoplifting001_x264.mp4"), num_frames=24, width=320, height=240)
    write_test_video(str(d / "Shopping" / "Shopping001_x264.mp4"), num_frames=24, width=320, height=240, seed=1)
    lines = ["Abuse/Abuse001_x264.mp4", "Shoplifting/Shoplifting001_x264.mp4",
             "Shopping/Shopping001_x264.mp4", "Shoplifting/Shoplifting999_missing.mp4"]
    (d / "Anomaly_Train.txt").write_text("\n".join(lines))
    return str(d)


def test_preprocess_ucf_crime_end_to_end(ucf_dir, tmp_path):
    cfg = get_default_config()
    cfg["detector"].update(
        img_size=128, width_mult=0.25, depth_mult=0.34, batch_size=8,
        conf_threshold=0.0, max_detections=8, dtype="float32",
    )
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    stats = preprocess_ucf_crime(cfg, ucf_dir, output_dir=out, verbose=False)
    assert stats["videos"] == 2
    assert stats["frames"] == 48
    assert stats["skipped"] == ["Shoplifting/Shoplifting999_missing.mp4"]
    # anomaly rows routed to the anomaly CSV with the reference clip ids
    anom = read_bboxes(os.path.join(out, "ucf-crime_dataset.csv"))
    norm = read_bboxes(os.path.join(out, "ucf-crime_dataset-normal.csv"))
    assert anom and norm
    assert all(r.anomaly == "Shoplifting" and r.is_anomaly for r in anom)
    assert all(r.anomaly == "Shopping" and not r.is_anomaly for r in norm)
    assert {r.clip for r in anom} == {2}  # position in the full list
    assert {r.clip for r in norm} == {3}
    assert min(r.frame for r in anom) >= 1 and max(r.frame for r in anom) <= 24
    for r in anom + norm:  # normalized coords
        assert 0.0 <= r.left <= 1.0 and 0.0 <= r.top <= 1.0
        assert 0.0 < r.width <= 1.0 and 0.0 < r.height <= 1.0


def test_preprocess_multiplexed_matches_sequential(ucf_dir, tmp_path):
    """max_streams>1 multiplexes videos into shared batches; CSV bytes must be
    identical to the sequential driver's (per-video tracker/frame order is
    independent of multiplexing), in both letterbox modes."""
    for host_lb in (False, True, "content"):
        cfg = get_default_config()
        cfg["detector"].update(
            img_size=128, width_mult=0.25, depth_mult=0.34, batch_size=8,
            conf_threshold=0.0, max_detections=8, dtype="float32",
            host_letterbox=host_lb,
        )
        pipe = DetectionPipeline(cfg)
        tag = {False: "dev", True: "lb", "content": "content"}[host_lb]
        seq_dir = str(tmp_path / f"seq_{tag}")
        mux_dir = str(tmp_path / f"mux_{tag}")
        os.makedirs(seq_dir), os.makedirs(mux_dir)
        s = preprocess_ucf_crime(cfg, ucf_dir, output_dir=seq_dir, verbose=False,
                                 pipeline=pipe)
        m = preprocess_ucf_crime(cfg, ucf_dir, output_dir=mux_dir, verbose=False,
                                 pipeline=pipe, max_streams=4)
        assert m["videos"] == s["videos"] == 2
        assert m["frames"] == s["frames"] == 48
        assert m["rows"] == s["rows"] > 0
        for fname in sorted(os.listdir(seq_dir)):
            with open(os.path.join(seq_dir, fname), "rb") as f1, \
                 open(os.path.join(mux_dir, fname), "rb") as f2:
                assert f1.read() == f2.read(), f"{tag}/{fname} differs"
    # content-only upload is numerically identical to full-canvas host
    # letterbox (device adds the same constant-114 border): same CSV bytes
    for fname in sorted(os.listdir(str(tmp_path / "seq_lb"))):
        with open(str(tmp_path / "seq_lb" / fname), "rb") as f1, \
             open(str(tmp_path / "seq_content" / fname), "rb") as f2:
            assert f1.read() == f2.read(), f"content vs canvas {fname} differs"

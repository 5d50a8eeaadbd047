"""Degenerate-input robustness: empty videos, empty datasets, zero detections."""

import os
import pickle

import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.data.poselift import PoseLiftDataset
from cvsd_tpu.data.video import VideoBatcher, write_test_video
from cvsd_tpu.pipeline.preprocess import DetectionPipeline, process_video
from cvsd_tpu.track.tracker import IoUTracker
from cvsd_tpu.utils.metrics import compute_metrics


def test_single_frame_video(tmp_path):
    p = write_test_video(str(tmp_path / "one.mp4"), num_frames=1, width=320, height=240)
    batches = list(VideoBatcher(p, batch_size=16))
    assert len(batches) == 1
    assert batches[0].mask.sum() == 1
    assert batches[0].frame_numbers[0] == 1


def test_empty_poselift_split(tmp_path):
    (tmp_path / "Pickle_files" / "Train").mkdir(parents=True)
    ds = PoseLiftDataset(str(tmp_path), split="train", verbose=False)
    assert len(ds) == 0
    assert ds.poses.shape == (0, 12, 18, 2)


def test_poselift_video_shorter_than_window(tmp_path):
    (tmp_path / "Pickle_files" / "Train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    data = {f: {0: [None, rng.uniform(0, 1, (17, 3))]} for f in range(5)}  # < seq_len
    with open(tmp_path / "Pickle_files" / "Train" / "v.pkl", "wb") as f:
        pickle.dump(data, f)
    ds = PoseLiftDataset(str(tmp_path), split="train", seq_len=12, verbose=False)
    assert len(ds) == 0


def test_tracker_empty_frames():
    tr = IoUTracker()
    assert tr.update(np.zeros((0, 4), np.float32)) == []
    tr.update(np.array([[0, 0, 10, 10]], np.float32))
    assert tr.update(np.zeros((0, 4), np.float32)) == []  # miss, no crash


def test_process_video_no_detections(tmp_path):
    """conf_threshold=1.0 -> zero detections -> zero rows, no crash."""
    video = write_test_video(str(tmp_path / "v.mp4"), num_frames=10, width=320, height=240)
    cfg = get_default_config()
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34, batch_size=8,
                           conf_threshold=1.0, max_detections=4, dtype="float32")
    pipe = DetectionPipeline(cfg)
    csv_path = str(tmp_path / "out.csv")
    r = process_video(pipe, video, 1, "Shopping", "v.mp4", csv_path, False)
    assert r["frames"] == 10 and r["rows"] == 0
    assert not os.path.exists(csv_path)


def test_metrics_empty_inputs():
    m = compute_metrics(np.zeros(0), np.zeros(0))
    assert m["auc_roc"] == 0.5
    assert np.isfinite(m["accuracy"])

import os
import pickle

import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.data.poselift import PoseLiftDataset
from cvsd_tpu.data.ucf_crime import TemporalAnnotation
from cvsd_tpu.data.video import write_test_video
from cvsd_tpu.pipeline.pose_export import export_poselift_dataset, extract_pose_data
from cvsd_tpu.pipeline.preprocess import DetectionPipeline


@pytest.fixture(scope="module")
def pose_pipeline():
    cfg = get_default_config()
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=8, conf_threshold=0.0, max_detections=4,
                           dtype="float32", pose_head=True)
    return DetectionPipeline(cfg)


def test_extract_pose_data_format(pose_pipeline, tmp_path):
    video = write_test_video(str(tmp_path / "v.mp4"), num_frames=20, width=320, height=240)
    data = extract_pose_data(pose_pipeline, video)
    assert data, "expected tracked pose frames"
    frame = data[min(data)]
    pid, (bbox, kpts) = next(iter(frame.items()))
    assert isinstance(pid, int)
    assert bbox.shape == (4,)
    assert kpts.shape == (17, 3)
    # coordinates in source pixels
    assert 0 <= kpts[:, 0].min() and kpts[:, 0].max() <= 4 * 320  # loose (untrained head)


def test_export_roundtrips_through_poselift_dataset(pose_pipeline, tmp_path):
    out = str(tmp_path / "PoseLift")
    train_v = write_test_video(str(tmp_path / "t1.mp4"), num_frames=24, width=320, height=240)
    test_v = write_test_video(str(tmp_path / "e1.mp4"), num_frames=24, width=320, height=240, seed=5)
    ann = {"e1": TemporalAnnotation("e1", "Shoplifting", [(10, 20)])}
    export_poselift_dataset(pose_pipeline, [train_v], out, split="Train", verbose=False)
    stats = export_poselift_dataset(pose_pipeline, [test_v], out, split="Test",
                                    annotations=ann, verbose=False)
    assert stats["videos"] == 1
    # on-disk format checks
    with open(os.path.join(out, "Pickle_files", "Test", "e1.pkl"), "rb") as f:
        data = pickle.load(f)
    assert isinstance(data, dict)
    gt = np.load(os.path.join(out, "Pickle_files", "GT", "e1.npy"))
    assert gt[9:20].sum() > 0  # annotated range labelled anomalous

    # our own PoseLift loader must ingest the export
    ds = PoseLiftDataset(out, split="train", seq_len=12, stride=6,
                         num_keypoints=18, verbose=False)
    assert len(ds) > 0
    assert ds.poses.shape[1:] == (12, 18, 2)
    ds_test = PoseLiftDataset(out, split="test", seq_len=12, stride=6,
                              num_keypoints=18, verbose=False)
    assert len(ds_test) > 0

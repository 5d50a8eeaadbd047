import numpy as np
import pytest

from cvsd_tpu.data.render import render_pose_frame, render_pose_video, rendered_detection_batch
from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
from cvsd_tpu.data.video import video_info


def test_render_pose_frame_geometry(rng):
    ds = SyntheticPoseLiftDataset(1, seq_len=1, seed=0)
    pose = ds.poses[0, 0]
    frame, box, pts = render_pose_frame(pose, 240, 320, rng, scale=0.6, offset=(0.2, 0.2))
    assert frame.shape == (240, 320, 3) and frame.dtype == np.uint8
    assert pts.shape == (17, 2)
    # all keypoints inside the reported box
    assert np.all(pts[:, 0] >= box[0]) and np.all(pts[:, 0] <= box[2])
    assert np.all(pts[:, 1] >= box[1]) and np.all(pts[:, 1] <= box[3])
    # joints rendered bright: pixels near a keypoint exceed the noise floor
    x, y = int(pts[0, 0]), int(pts[0, 1])
    assert frame[y, x].max() >= 120


def test_rendered_detection_batch_shapes(rng):
    images, boxes, valid, kpts = rendered_detection_batch(rng, 6, 96)
    assert images.shape == (6, 96, 96, 3)
    assert boxes.shape == (6, 1, 4) and valid.all()
    assert kpts.shape == (6, 1, 17, 2)
    assert images.min() >= 0 and images.max() <= 1
    # keypoints inside boxes
    for b in range(6):
        assert np.all(kpts[b, 0, :, 0] >= boxes[b, 0, 0] - 1e-3)
        assert np.all(kpts[b, 0, :, 0] <= boxes[b, 0, 2] + 1e-3)


def test_render_pose_video(tmp_path):
    ds = SyntheticPoseLiftDataset(1, seq_len=10, seed=1)
    p = render_pose_video(str(tmp_path / "r.mp4"), ds.poses[0], width=160, height=120)
    info = video_info(p)
    assert info.num_frames == 10
    assert (info.width, info.height) == (160, 120)

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
    # without joint jitter, keypoints sit inside the (unclipped) GT box;
    # WITH jitter (the training default) a joint may leave the canvas while
    # the box is clipped to it, so containment is only asserted jitter-free
    images, boxes, valid, kpts = rendered_detection_batch(rng, 6, 96, joint_jitter=0.0)
    for b in range(6):
        assert np.all(kpts[b, 0, :, 0] >= boxes[b, 0, 0] - 1e-3)
        assert np.all(kpts[b, 0, :, 0] <= boxes[b, 0, 2] + 1e-3)


def test_render_pose_video(tmp_path):
    ds = SyntheticPoseLiftDataset(1, seq_len=10, seed=1)
    p = render_pose_video(str(tmp_path / "r.mp4"), ds.poses[0], width=160, height=120)
    info = video_info(p)
    assert info.num_frames == 10
    assert (info.width, info.height) == (160, 120)


# ---------- hard multi-person scenes (round 2) ----------

def test_render_scene_geometry_and_occlusion(rng):
    from cvsd_tpu.data.render import render_scene

    found_multi = False
    for seed in range(6):
        r = np.random.default_rng(seed)
        frame, boxes, valid, kpts, vis = render_scene(r, 160, 160, max_persons=4)
        assert frame.shape == (160, 160, 3) and frame.dtype == np.float32
        assert frame.min() >= 0 and frame.max() <= 1
        assert boxes.shape == (4, 4) and kpts.shape == (4, 17, 2) and vis.shape == (4,)
        n = int((boxes.sum(-1) > 0).sum())
        if n >= 2:
            found_multi = True
        for i in range(4):
            if valid[i]:
                assert vis[i] >= 0.3
                # keypoints inside (clipped) boxes where the box wasn't clipped away
                inside_x = (kpts[i, :, 0] >= boxes[i, 0] - 1) & (kpts[i, :, 0] <= boxes[i, 2] + 1)
                assert inside_x.mean() > 0.5
    assert found_multi


def test_render_scene_occluder_reduces_visibility():
    from cvsd_tpu.data.render import render_scene

    # same RNG stream, occluder always on vs always off -> different scenes is
    # fine; instead assert the visibility bookkeeping: fully unoccluded single
    # person has vis ~1
    r = np.random.default_rng(0)
    _, _, valid, _, vis = render_scene(r, 128, 128, max_persons=1, occluder_prob=0.0)
    assert valid[0] and vis[0] > 0.95


def test_rendered_scene_batch_shapes(rng):
    from cvsd_tpu.data.render import rendered_scene_batch

    images, boxes, valid, kpts = rendered_scene_batch(rng, 5, 128, max_persons=3)
    assert images.shape == (5, 128, 128, 3)
    assert boxes.shape == (5, 3, 4) and valid.shape == (5, 3)
    assert kpts.shape == (5, 3, 17, 2)
    assert valid.any()  # at least one visible person somewhere

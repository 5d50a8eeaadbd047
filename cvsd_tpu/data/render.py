"""Synthetic person renderer: draw pose skeletons into video frames.

Completes the synthetic fixture family (SURVEY §4): `SyntheticPoseLiftDataset`
generates pose sequences; this module renders those sequences into actual
RGB frames (bright joints + limb segments on noise), giving ground-truth
boxes and keypoints per frame. Used to train the detector + pose head and to
exercise the WHOLE video -> detection -> pose -> Shopformer path end-to-end
with no real dataset (see examples/end_to_end_synthetic.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from cvsd_tpu.data.synthetic import SyntheticPoseLiftDataset
from cvsd_tpu.models.graph import get_skeleton_adjacency

_EDGES = np.argwhere(np.triu(get_skeleton_adjacency(17, "coco") - np.eye(17)) > 0)


def render_pose_frame(
    pose: np.ndarray,  # (17, 2) in [0,1] canonical coordinates
    height: int,
    width: int,
    rng: np.random.Generator,
    scale: float = 0.7,
    offset: Tuple[float, float] = (0.15, 0.15),
    joint_radius: int = 3,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Render one skeleton -> (frame (H,W,3) uint8, box xyxy px, kpts (17,2) px)."""
    frame = rng.integers(0, 50, (height, width, 3)).astype(np.uint8)
    pts = np.empty((17, 2), np.float32)
    pts[:, 0] = (offset[0] + pose[:, 0] * scale) * width
    pts[:, 1] = (offset[1] + pose[:, 1] * scale) * height
    yy, xx = np.mgrid[0:height, 0:width]
    # limbs: bright line segments (sampled points, cheap)
    for a, b in _EDGES:
        for t in np.linspace(0, 1, 12):
            x = pts[a, 0] * (1 - t) + pts[b, 0] * t
            y = pts[a, 1] * (1 - t) + pts[b, 1] * t
            xi, yi = int(round(x)), int(round(y))
            if 0 <= yi < height - 1 and 0 <= xi < width - 1:
                frame[yi : yi + 2, xi : xi + 2] = (210, 210, 160)
    # joints: bright disks
    for x, y in pts:
        xi, yi = int(round(x)), int(round(y))
        y0, y1 = max(yi - joint_radius, 0), min(yi + joint_radius + 1, height)
        x0, x1 = max(xi - joint_radius, 0), min(xi + joint_radius + 1, width)
        if y0 < y1 and x0 < x1:
            frame[y0:y1, x0:x1] = (250, 220, 120)
    pad = 6.0
    box = np.array([pts[:, 0].min() - pad, pts[:, 1].min() - pad,
                    pts[:, 0].max() + pad, pts[:, 1].max() + pad], np.float32)
    box = np.clip(box, 0, [width, height, width, height])
    return frame, box, pts


def rendered_detection_batch(
    rng: np.random.Generator, batch: int, img_size: int, seq_source: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Training batch for the detector+pose head: rendered skeletons with GT
    (images in [0,1] f32, boxes (B,1,4), valid (B,1), kpts (B,1,17,2))."""
    if seq_source is None:
        ds = SyntheticPoseLiftDataset(num_samples=max(batch // 4, 2), seq_len=8,
                                      anomaly_ratio=0.5, seed=int(rng.integers(1 << 30)))
        seq_source = ds.poses.reshape(-1, 17, 2)
    images = np.empty((batch, img_size, img_size, 3), np.float32)
    boxes = np.zeros((batch, 1, 4), np.float32)
    valid = np.ones((batch, 1), bool)
    kpts = np.zeros((batch, 1, 17, 2), np.float32)
    for b in range(batch):
        pose = seq_source[rng.integers(len(seq_source))]
        scale = rng.uniform(0.4, 0.8)
        off = (rng.uniform(0.02, 0.5), rng.uniform(0.02, 0.5))
        frame, box, pts = render_pose_frame(pose, img_size, img_size, rng, scale, off)
        images[b] = frame / 255.0
        boxes[b, 0] = box
        kpts[b, 0] = pts
    return images, boxes, valid, kpts


def render_pose_video(
    path: str,
    poses: np.ndarray,  # (T, 17, 2) canonical
    width: int = 320,
    height: int = 240,
    fps: float = 30.0,
    seed: int = 0,
    scale: float = 0.7,
    offset: Tuple[float, float] = (0.15, 0.15),
) -> str:
    """Render a pose sequence as an mp4 (one moving person)."""
    import cv2

    rng = np.random.default_rng(seed)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height))
    try:
        for pose in poses:
            frame, _box, _pts = render_pose_frame(pose, height, width, rng, scale, offset)
            writer.write(frame[..., ::-1])  # RGB -> BGR
    finally:
        writer.release()
    return path

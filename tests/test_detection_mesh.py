"""DP inference: detection results over a mesh must match single-device."""

import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.parallel import MeshConfig
from cvsd_tpu.pipeline.preprocess import DetectionPipeline


def test_detection_on_mesh_matches_single_device(rng):
    cfg = get_default_config()
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=8, conf_threshold=0.0, max_detections=8,
                           dtype="float32")
    single = DetectionPipeline(cfg)
    mc = MeshConfig.from_config(cfg)
    sharded = DetectionPipeline(cfg, variables=single.variables, mesh_config=mc)
    assert sharded.batch_size % 8 == 0

    frames = rng.integers(0, 255, (8, 240, 320, 3)).astype(np.uint8)
    out_s = single.detect_frames(frames)
    out_m = sharded.detect_frames(frames)
    for a, b in zip(out_s, out_m):
        np.testing.assert_allclose(a, b, atol=1e-4)

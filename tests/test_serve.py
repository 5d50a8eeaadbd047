"""HTTP serving endpoint (serve/server.py)."""

import json
import urllib.request

import numpy as np
import pytest

import jax

from cvsd_tpu.config import get_default_config
from cvsd_tpu.eval.evaluate import ShopformerScorer
from cvsd_tpu.models.shopformer import build_shopformer
from cvsd_tpu.serve.server import ScoringServer

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def server():
    cfg = get_default_config()
    cfg["model"]["hidden_channels"] = 8
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=1, conf_threshold=0.0, max_detections=4,
                           dtype="float32", pose_head=True)
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline

    detection = DetectionPipeline(cfg)
    srv = ScoringServer(scorer, detection, port=0)  # ephemeral port
    srv.start()
    yield srv
    srv.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, data, content_type="application/json"):
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": content_type})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    status, obj = _get(f"http://127.0.0.1:{server.port}/healthz")
    assert status == 200 and obj["status"] == "ok" and obj["detector"]


def test_score_endpoint(server):
    cfg = server.scorer.config["model"]
    T, V = int(cfg.get("seq_len", 12)), int(cfg.get("num_keypoints", 18))
    poses = np.random.default_rng(0).normal(size=(3, T, V, 2)).tolist()
    status, obj = _post(f"http://127.0.0.1:{server.port}/score",
                        json.dumps({"poses": poses}).encode())
    assert status == 200
    assert len(obj["scores"]) == 3 and all(np.isfinite(obj["scores"]))
    # must match the direct API
    direct = server.scorer.score(np.asarray(poses, np.float32))
    np.testing.assert_allclose(obj["scores"], direct, rtol=1e-5)


def test_detect_endpoint(server):
    img = np.random.default_rng(1).integers(0, 255, (240, 320, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    status, obj = _post(f"http://127.0.0.1:{server.port}/detect",
                        buf.tobytes(), "image/jpeg")
    assert status == 200
    assert len(obj["boxes"]) == len(obj["scores"])
    for b in obj["boxes"]:
        assert len(b) == 4


def test_detect_unmaps_to_source_pixels(server):
    """An oracle detection pipeline shows /detect's canvas->source unmap is
    exact: a box at known canvas coords comes back at the right source
    pixels for a non-square image."""
    import types

    from cvsd_tpu.ops.letterbox import letterbox_params

    size = server.detection.model.img_size
    h, w = 240, 320
    scale, px, py, nw, nh = letterbox_params(h, w, size)
    # canvas-space box corresponding to source box (40, 60, 200, 180)
    src = np.array([40.0, 60.0, 200.0, 180.0])
    canvas_box = np.array([src[0] * scale + px, src[1] * scale + py,
                           src[2] * scale + px, src[3] * scale + py])

    class Oracle:
        model = server.detection.model

        @staticmethod
        def detect_frames(frames):
            assert frames.shape == (1, size, size, 3)
            return (canvas_box[None, None].astype(np.float32),
                    np.zeros((1, 1, 4), np.float32),
                    np.array([[0.9]], np.float32),
                    np.array([[True]]))

    real = server.detection
    server.detection = Oracle()
    try:
        img = np.random.default_rng(2).integers(0, 255, (h, w, 3), np.uint8)
        ok, buf = cv2.imencode(".png", img)
        status, obj = _post(f"http://127.0.0.1:{server.port}/detect",
                            buf.tobytes(), "image/png")
        assert status == 200
        np.testing.assert_allclose(obj["boxes"][0], src, atol=0.05)
    finally:
        server.detection = real


def test_bad_requests(server):
    status, obj = _post(f"http://127.0.0.1:{server.port}/score",
                        json.dumps({"poses": [[1.0]]}).encode())
    assert status == 400 and "poses" in obj["error"]
    # wrong T: right rank, wrong window shape — must 400, not retrace
    bad = np.zeros((1, 3, 18, 2)).tolist()
    status, obj = _post(f"http://127.0.0.1:{server.port}/score",
                        json.dumps({"poses": bad}).encode())
    assert status == 400 and "poses must be" in obj["error"]
    status, obj = _post(f"http://127.0.0.1:{server.port}/detect", b"not an image",
                        "image/jpeg")
    assert status == 400
    status, obj = _get(f"http://127.0.0.1:{server.port}/healthz")
    assert status == 200  # server still alive after errors

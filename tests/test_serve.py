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
            B = frames.shape[0]  # 1 direct, detect_batch via micro-batcher
            assert frames.shape[1:] == (size, size, 3)
            boxes = np.zeros((B, 1, 4), np.float32)
            boxes[0, 0] = canvas_box
            scores = np.zeros((B, 1), np.float32)
            scores[0, 0] = 0.9
            valid = np.zeros((B, 1), bool)
            valid[0, 0] = True
            return (boxes, np.zeros((B, 1, 4), np.float32), scores, valid)

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


def test_concurrent_score_requests_share_dispatches(server):
    """32 concurrent clients: the micro-batcher must pack >1 request per
    device dispatch with responses identical to serial scoring (VERDICT r3
    #6 — one relay round-trip per request capped the server at ~1/RTT)."""
    from concurrent.futures import ThreadPoolExecutor

    m = server.scorer.config["model"]
    T, V = int(m.get("seq_len", 12)), int(m.get("num_keypoints", 18))
    rng = np.random.default_rng(3)
    payloads = [rng.normal(size=(2, T, V, 2)).astype(np.float32)
                for _ in range(24)]
    direct = [server.scorer.score(p) for p in payloads]

    url = f"http://127.0.0.1:{server.port}/score"
    mb = server._score_mb
    assert mb is not None
    b0, i0 = mb.batches, mb.items
    old_window = mb._window
    mb._window = 0.03  # force a gather window so batching is deterministic
    try:
        with ThreadPoolExecutor(max_workers=32) as ex:
            results = list(ex.map(
                lambda p: _post(url, json.dumps(
                    {"poses": p.tolist()}).encode()), payloads))
    finally:
        mb._window = old_window
    for (status, obj), want in zip(results, direct):
        assert status == 200
        np.testing.assert_allclose(obj["scores"], want, rtol=1e-5)
    di, db = mb.items - i0, mb.batches - b0
    assert di == 24
    assert db < di, f"no batching happened: {db} dispatches for {di} requests"
    # stats surface on /healthz
    _, h = _get(f"http://127.0.0.1:{server.port}/healthz")
    assert h["microbatch"]["score"]["items"] >= 24


def test_concurrent_detect_requests_share_dispatches(server):
    from concurrent.futures import ThreadPoolExecutor

    img = np.random.default_rng(4).integers(0, 255, (240, 320, 3), np.uint8)
    ok, buf = cv2.imencode(".png", img)  # png: identical payload each time
    assert ok
    url = f"http://127.0.0.1:{server.port}/detect"
    serial = _post(url, buf.tobytes(), "image/png")[1]

    mb = server._detect_mb
    assert mb is not None
    b0, i0 = mb.batches, mb.items
    old_window = mb._window
    mb._window = 0.03
    try:
        with ThreadPoolExecutor(max_workers=8) as ex:
            results = [ex.submit(_post, url, buf.tobytes(), "image/png")
                       for _ in range(8)]
            results = [f.result() for f in results]
    finally:
        mb._window = old_window
    for status, obj in results:
        assert status == 200
        assert obj == serial  # identical image -> identical response
    di, db = mb.items - i0, mb.batches - b0
    assert di >= 8 and db < di


def test_warmup_compiles_the_serving_programs():
    """warmup() must dispatch the exact static shapes live traffic uses, so
    the first real request re-uses the compiled programs (no second trace).
    Fresh server instance: the module fixture has already dispatched."""
    cfg = get_default_config()
    cfg["model"]["hidden_channels"] = 8
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=1, conf_threshold=0.0, max_detections=4,
                           dtype="float32", pose_head=True)
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline

    detection = DetectionPipeline(cfg)
    srv = ScoringServer(scorer, detection, port=0, microbatch=False)
    # no-microbatch /detect dispatches batch 1 per request — warmup must warm
    # THAT program, not the detect_batch one (advisor r4: warming only the
    # padded shape left the first real /detect paying the full compile)
    seen_batches = []
    real_detect = detection.detect_frames

    def spy(frames, *a, **k):
        seen_batches.append(len(frames))
        return real_detect(frames, *a, **k)

    detection.detect_frames = spy
    times = srv.warmup()
    detection.detect_frames = real_detect
    assert seen_batches == [1]
    assert set(times) == {"score_s", "detect_s"}
    assert all(t >= 0 for t in times.values())
    assert scorer._score._cache_size() == 1
    # real traffic after warmup: same padded shape, so NO new compile
    T = int(cfg["model"].get("seq_len", 12))
    V = int(cfg["model"].get("num_keypoints", 18))
    out = srv.score({"poses": np.zeros((3, T, V, 2)).tolist()})
    assert len(out["scores"]) == 3
    assert scorer._score._cache_size() == 1

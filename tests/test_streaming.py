import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.data.video import write_test_video
from cvsd_tpu.eval.evaluate import ShopformerScorer
from cvsd_tpu.models.shopformer import build_shopformer
from cvsd_tpu.pipeline.streaming import StreamingPipeline


@pytest.fixture(scope="module")
def streaming(tmp_path_factory):
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
    video = write_test_video(str(tmp_path_factory.mktemp("sv") / "v.mp4"),
                             num_frames=30, width=320, height=240)
    return pipe, video


def test_stream_video_emits_events(streaming):
    pipe, video = streaming
    events = list(pipe.stream_video(video))
    assert events, "expected at least one scored window"
    ev = events[0]
    assert ev.video == "v.mp4"
    assert len(ev.frames) == pipe.seq_len
    assert ev.frame_end == ev.frames[-1]
    assert np.isfinite(ev.score) and ev.score >= 0
    assert ev.timestamp_ms >= 0


def test_stream_videos_stats(streaming):
    pipe, video = streaming
    out = pipe.stream_videos([video, video])
    assert out["videos"] == 2
    assert out["frames"] == 60
    assert out["fps"] > 0 and out["videos_per_hour"] > 0
    assert len(out["events"]) >= 2


def test_aggregate_events(streaming):
    pipe, video = streaming
    events = list(pipe.stream_video(video))
    agg = pipe.aggregate_events(events)
    assert "v.mp4" in agg
    a = agg["v.mp4"]
    assert a["max"] >= a["mean"] >= 0
    assert a["max"] >= a["percentile_95"] - 1e-9


def test_stream_videos_concurrent_matches_sequential(streaming, tmp_path_factory):
    from cvsd_tpu.data.video import write_test_video

    pipe, video = streaming
    v2 = write_test_video(str(tmp_path_factory.mktemp("sv2") / "w.mp4"),
                          num_frames=25, width=320, height=240, seed=9)
    seq_events = list(pipe.stream_video(video)) + list(pipe.stream_video(v2))
    out = pipe.stream_videos_concurrent([video, v2], max_streams=2)
    assert out["frames"] == 55
    # same set of (video, track, frame_end) windows regardless of scheduling
    key = lambda e: (e.video, e.track_id, e.frame_end)  # noqa: E731
    assert sorted(map(key, out["events"])) == sorted(map(key, seq_events))
    # identical scores for identical windows
    seq_scores = {key(e): e.score for e in seq_events}
    for e in out["events"]:
        assert abs(seq_scores[key(e)] - e.score) < 1e-4


def test_streaming_on_mesh_matches_single_device(streaming, tmp_path_factory):
    """Multi-chip streaming (SURVEY: shard concurrent video streams across
    chips): frame batches sharded over the data mesh axis produce events
    identical to single-device streaming."""
    import jax

    from cvsd_tpu.data.video import write_test_video
    from cvsd_tpu.parallel import MeshConfig

    pipe, video = streaming
    v2 = write_test_video(str(tmp_path_factory.mktemp("svm") / "m.mp4"),
                          num_frames=25, width=320, height=240, seed=5)
    out_single = pipe.stream_videos_concurrent([video, v2], max_streams=2)

    mc = MeshConfig.from_config(pipe.config)
    pipe_mesh = StreamingPipeline(
        pipe.config, pipe.scorer,
        detector_variables=jax.device_get(pipe.detection.variables),
        mesh_config=mc)
    assert pipe_mesh.detection.mesh_config is not None
    out_mesh = pipe_mesh.stream_videos_concurrent([video, v2], max_streams=2)

    key = lambda e: (e.video, e.track_id, e.frame_end)  # noqa: E731
    assert sorted(map(key, out_mesh["events"])) == sorted(map(key, out_single["events"]))
    scores = {key(e): e.score for e in out_single["events"]}
    for e in out_mesh["events"]:
        assert abs(scores[key(e)] - e.score) < 1e-3


def test_streaming_score_depth_does_not_change_events(streaming, tmp_path_factory):
    """Pipelined scoring (score_stream_depth>1) is a scheduling change only:
    the emitted event set and scores match a depth-1 run."""
    import copy

    import jax

    pipe, video = streaming
    base = {}
    for depth in (1, 4):
        cfg = copy.deepcopy(dict(pipe.config))
        cfg["detector"]["score_stream_depth"] = depth
        p = StreamingPipeline(cfg, pipe.scorer,
                              detector_variables=jax.device_get(pipe.detection.variables))
        out = p.stream_videos_concurrent([video], max_streams=1)
        base[depth] = out["events"]
    key = lambda e: (e.video, e.track_id, e.frame_end)  # noqa: E731
    assert sorted(map(key, base[1])) == sorted(map(key, base[4]))
    s1 = {key(e): e.score for e in base[1]}
    for e in base[4]:
        assert abs(s1[key(e)] - e.score) < 1e-5


def test_host_letterbox_matches_device_letterbox():
    """cv2-based host letterbox (relay-serving mode) reproduces the on-device
    letterbox geometry and values to interpolation tolerance."""
    import cv2
    import jax.numpy as jnp

    from cvsd_tpu.ops.letterbox import letterbox_batch, letterbox_params

    # smooth natural-image-like content: on downscale, cv2 INTER_LINEAR
    # (4-tap, the reference/ultralytics host path) and jax.image.resize
    # 'linear' (anti-aliased) agree closely on smooth content and differ
    # on per-pixel noise — video frames are the former
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    img = np.stack([100 + 100 * np.sin(xx / 40), 120 + 80 * np.cos(yy / 30),
                    60 + 0.3 * xx + 0.2 * yy], -1).clip(0, 255).astype(np.uint8)
    frames = np.stack([img, img[::-1].copy()])
    size = 128
    dev = np.asarray(letterbox_batch(jnp.asarray(frames), size=size, dtype=jnp.float32))

    scale, px, py, nw, nh = letterbox_params(240, 320, size)
    host = np.full((2, size, size, 3), 114, np.uint8)
    for b in range(2):
        host[b, py:py + nh, px:px + nw] = cv2.resize(
            frames[b], (nw, nh), interpolation=cv2.INTER_LINEAR)
    host_f = host.astype(np.float32) / 255.0
    # same geometry: padding regions identical; content within interp tolerance
    np.testing.assert_allclose(host_f[:, :py], dev[:, :py], atol=1e-6)
    assert np.mean(np.abs(host_f - dev)) < 0.01
    assert np.max(np.abs(host_f - dev)) < 0.25  # edge pixels, half-pixel conventions


def test_streaming_host_letterbox_mode(streaming, tmp_path_factory):
    """detector.host_letterbox=true: canvas-sized uploads, finite scores,
    same windows emitted as the device-letterbox path."""
    import copy

    import jax

    pipe, video = streaming
    cfg = copy.deepcopy(dict(pipe.config))
    cfg["detector"]["host_letterbox"] = True
    p = StreamingPipeline(cfg, pipe.scorer,
                          detector_variables=jax.device_get(pipe.detection.variables))
    out = p.stream_videos_concurrent([video], max_streams=1)
    assert out["frames"] == 30
    assert out["events"], "expected scored windows"
    assert all(np.isfinite(e.score) for e in out["events"])
    # deterministic: a second run emits identical events (the noise-video
    # fixture + random weights makes cross-interpolation window equality
    # meaningless; self-consistency is the invariant)
    out2 = p.stream_videos_concurrent([video], max_streams=1)
    key = lambda e: (e.video, e.track_id, e.frame_end, round(e.score, 6))  # noqa: E731
    assert sorted(map(key, out["events"])) == sorted(map(key, out2["events"]))
    # content-only upload (device pads the constant border) is numerically
    # identical to the full-canvas host letterbox: same events
    cfg_c = copy.deepcopy(cfg)
    cfg_c["detector"]["host_letterbox"] = "content"
    pc = StreamingPipeline(cfg_c, pipe.scorer,
                           detector_variables=jax.device_get(pipe.detection.variables))
    out_c = pc.stream_videos_concurrent([video], max_streams=1)
    assert sorted(map(key, out["events"])) == sorted(map(key, out_c["events"]))


def test_streaming_events_join_with_annotations(streaming):
    """Live pipeline -> evaluate_streaming GT join (the cli.stream
    --annotations path): events group by video, AUC computed over videos."""
    from cvsd_tpu.data.ucf_crime import TemporalAnnotation
    from cvsd_tpu.eval.streaming_eval import evaluate_streaming

    pipe, video = streaming
    events = list(pipe.stream_video(video))
    anns = [TemporalAnnotation("v.mp4", "Shoplifting", [(1, 30)]),
            TemporalAnnotation("other.mp4", "Normal", [])]
    res = evaluate_streaming(events, anns, n_boot=10,
                             include_eventless_videos=["other.mp4"])
    assert res.n_videos == 2
    assert res.per_video["v"]["label"] == 1 and res.per_video["other"]["label"] == 0
    # single anomalous video with events scores above the eventless normal
    assert res.video_auc == 1.0
    assert res.n_events == len(events)


def test_on_event_callback_receives_all_events(streaming, tmp_path_factory):
    pipe, video = streaming
    d = tmp_path_factory.mktemp("oe")
    from cvsd_tpu.data.video import write_test_video

    vids = [video, write_test_video(str(d / "w.mp4"), num_frames=30,
                                    width=320, height=240, seed=4)]
    live = []
    out = pipe.stream_videos_concurrent(vids, max_streams=2,
                                        on_event=live.append)
    assert len(live) == len(out["events"]) > 0
    key = lambda e: (e.video, e.track_id, e.frame_end, round(e.score, 5))  # noqa: E731
    assert sorted(map(key, live)) == sorted(map(key, out["events"]))
    assert out["skipped"] == 0 and out["videos"] == 2


def test_streaming_frame_stride(streaming, tmp_path_factory):
    """detector.frame_stride=2: every window samples alternating source
    frames, sequential and concurrent paths agree, and the frame counter
    reflects only detected frames (the throughput lever against the host
    decode floor — VERDICT r3 #4)."""
    pipe, video = streaming
    cfg = {**pipe.config, "detector": {**pipe.config["detector"],
                                       "frame_stride": 2,
                                       "native_decode": False}}
    spipe = StreamingPipeline(cfg, pipe.scorer)
    assert spipe.frame_stride == 2
    seq_events = list(spipe.stream_video(video))
    assert seq_events, "stride-2 streaming produced no events"
    for e in seq_events:
        diffs = np.diff(e.frames)
        assert (diffs == 2).all(), e.frames
        assert e.frames[0] % 2 == 1  # sampling grid 1, 3, 5, ...
    out = spipe.stream_videos_concurrent([video], max_streams=1)
    assert out["frames"] == 15  # 30 source frames, every 2nd detected
    key = lambda e: (e.video, e.track_id, e.frame_end)  # noqa: E731
    assert sorted(map(key, out["events"])) == sorted(map(key, seq_events))
    seq_scores = {key(e): e.score for e in seq_events}
    for e in out["events"]:
        assert abs(seq_scores[key(e)] - e.score) < 1e-4

    # native decoder path (when built): identical events at the same stride
    try:
        from cvsd_tpu.native.video import video_available
        have_native = video_available()
    except Exception:
        have_native = False
    if have_native:
        ncfg = {**cfg, "detector": {**cfg["detector"], "native_decode": True}}
        npipe = StreamingPipeline(ncfg, pipe.scorer)
        nout = npipe.stream_videos_concurrent([video], max_streams=1)
        assert sorted(map(key, nout["events"])) == sorted(map(key, out["events"]))
        for e in nout["events"]:
            assert abs(seq_scores[key(e)] - e.score) < 1e-4

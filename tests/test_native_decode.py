"""Native multi-stream batched decoder (native/video_decode.cpp)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cvsd_tpu.data.video import write_test_video

try:
    from cvsd_tpu.native.video import (MODE_CANVAS, MODE_CONTENT, MODE_RAW,
                                       MultiStreamDecoder, video_available)

    _HAVE = video_available()
except Exception:
    _HAVE = False

pytestmark = pytest.mark.skipif(not _HAVE, reason="native video lib not built")


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("nd")
    return [write_test_video(str(d / f"v{i}.mp4"), num_frames=18 + 4 * i,
                             width=320, height=240, seed=i) for i in range(3)]


def _decode_all_py(path):
    cap = cv2.VideoCapture(path)
    frames, stamps = [], []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f[..., ::-1].copy())
        stamps.append(cap.get(cv2.CAP_PROP_POS_MSEC))
    cap.release()
    return frames, stamps


def test_raw_mode_byte_exact_and_complete(videos):
    ref = {i: _decode_all_py(p) for i, p in enumerate(videos)}
    dec = MultiStreamDecoder(videos, max_streams=2, out_hw=(240, 320),
                             mode=MODE_RAW)
    got = {i: {} for i in range(3)}
    stamps = {i: {} for i in range(3)}
    while True:
        frames, sidx, fno, st, k = dec.next_batch(8)
        if k == 0:
            break
        for b in range(k):
            got[int(sidx[b])][int(fno[b])] = frames[b].copy()
            stamps[int(sidx[b])][int(fno[b])] = st[b]
    dec.close()
    for i in range(3):
        ref_frames, ref_stamps = ref[i]
        assert len(got[i]) == len(ref_frames)
        for n, f in enumerate(ref_frames, start=1):
            assert np.array_equal(got[i][n], f)
            np.testing.assert_allclose(stamps[i][n], ref_stamps[n - 1])


def test_content_and_canvas_modes_match_cv2(videos):
    ref_frames, _ = _decode_all_py(videos[0])
    r = cv2.resize(ref_frames[0][..., ::-1], (128, 96),
                   interpolation=cv2.INTER_LINEAR)[..., ::-1]
    dec = MultiStreamDecoder([videos[0]], 1, (96, 128), MODE_CONTENT, (96, 128))
    fr, *_rest, k = dec.next_batch(2)
    dec.close()
    assert k == 2 and np.array_equal(fr[0], r)

    dec = MultiStreamDecoder([videos[0]], 1, (128, 128), MODE_CANVAS,
                             (96, 128), (0, 16))
    fr, *_rest, k = dec.next_batch(1)
    dec.close()
    assert (fr[0][:16] == 114).all() and (fr[0][112:] == 114).all()
    assert np.array_equal(fr[0][16:112], r)


def test_round_robin_and_eof_rollover(videos):
    """2 live streams round-robin; when one ends the queued third starts."""
    dec = MultiStreamDecoder(videos, max_streams=2, out_hw=(240, 320),
                             mode=MODE_RAW)
    seen = []
    while True:
        _, sidx, fno, _, k = dec.next_batch(4)
        if k == 0:
            break
        seen.extend((int(sidx[b]), int(fno[b])) for b in range(k))
    dec.close()
    # every stream fully decoded, frame numbers strictly increasing per stream
    per = {i: [f for s, f in seen if s == i] for i in range(3)}
    assert [len(per[i]) for i in range(3)] == [18, 22, 26]
    for i in range(3):
        assert per[i] == list(range(1, len(per[i]) + 1))
    # stream 2 only starts after one of 0/1 finished
    first2 = seen.index((2, 1))
    assert (0, 18) in seen[:first2] or (1, 1 + 21) in seen[:first2]


def _event_map(events):
    return {(e.video, e.track_id, e.frame_end): (round(e.score, 5),
                                                 tuple(e.frames),
                                                 round(e.timestamp_ms, 3))
            for e in events}


def test_video_batcher_native_decode_parity(tmp_path):
    """VideoBatcher with use_native_decode yields byte-identical batches
    (frames, numbers, stamps, mask) on both the ring and queue paths."""
    from cvsd_tpu.data.video import VideoBatcher

    p = write_test_video(str(tmp_path / "v.mp4"), num_frames=37,
                         width=320, height=240, seed=3)

    def collect(**kw):
        out = []
        for b in VideoBatcher(p, batch_size=8, **kw):
            for i in range(8):
                if b.mask[i]:
                    out.append((int(b.frame_numbers[i]),
                                float(b.timestamps_ms[i]), b.frames[i].copy()))
        return out

    for ring in (False, True):
        a = collect(use_native_ring=ring, use_native_decode=False)
        b = collect(use_native_ring=ring, use_native_decode=True)
        assert len(a) == len(b) == 37
        for (n1, t1, f1), (n2, t2, f2) in zip(a, b):
            assert n1 == n2 and abs(t1 - t2) < 1e-6
            assert np.array_equal(f1, f2)


@pytest.mark.slow
def test_preprocess_csv_bytes_identical_native_vs_python(tmp_path_factory, tmp_path):
    import os

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.pipeline.preprocess import DetectionPipeline, preprocess_ucf_crime

    d = tmp_path_factory.mktemp("ndpp")
    (d / "Shoplifting").mkdir()
    (d / "Shopping").mkdir()
    write_test_video(str(d / "Shoplifting" / "Shoplifting001_x264.mp4"),
                     num_frames=24, width=320, height=240)
    write_test_video(str(d / "Shopping" / "Shopping001_x264.mp4"),
                     num_frames=24, width=320, height=240, seed=1)
    (d / "Anomaly_Train.txt").write_text(
        "Shoplifting/Shoplifting001_x264.mp4\nShopping/Shopping001_x264.mp4")

    for host_lb in (False, "content"):
        cfg = get_default_config()
        cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                               batch_size=8, conf_threshold=0.0,
                               max_detections=8, dtype="float32",
                               host_letterbox=host_lb)
        pipe = DetectionPipeline(cfg)
        dirs = {}
        for native in (False, True):
            cfg["detector"]["native_decode"] = native
            out = str(tmp_path / f"{host_lb}_{native}")
            os.makedirs(out, exist_ok=True)
            preprocess_ucf_crime(cfg, str(d), output_dir=out, verbose=False,
                                 pipeline=pipe, max_streams=4)
            dirs[native] = out
        files = sorted(os.listdir(dirs[False]))
        assert files, "no CSVs emitted"
        for fname in files:
            with open(os.path.join(dirs[False], fname), "rb") as f1, \
                 open(os.path.join(dirs[True], fname), "rb") as f2:
                assert f1.read() == f2.read(), f"{host_lb}/{fname} differs"


@pytest.mark.slow
def test_streaming_events_identical_native_vs_python(tmp_path_factory):
    import jax

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.shopformer import build_shopformer
    from cvsd_tpu.pipeline.streaming import StreamingPipeline

    d = tmp_path_factory.mktemp("ndsv")
    vids = [write_test_video(str(d / f"s{i}.mp4"), num_frames=24,
                             width=320, height=240, seed=10 + i)
            for i in range(3)]
    cfg = get_default_config()
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=8, conf_threshold=0.0, max_detections=4,
                           dtype="float32", pose_head=True)
    cfg["model"]["hidden_channels"] = 8
    cfg["data"]["stride"] = 6
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)

    results = {}
    for native in (False, True):
        c = {**cfg, "detector": {**cfg["detector"], "native_decode": native}}
        pipe = StreamingPipeline(c, scorer)
        out = pipe.stream_videos_concurrent(vids, max_streams=2)
        results[native] = _event_map(out["events"])
    assert results[True], "native path produced no events"
    assert results[True] == results[False]


def test_raw_mode_frame_stride_matches_python(videos):
    """stride=3 returns source frames 1,4,7,... byte-exact with true frame
    numbers and timestamps (skipped frames advance the codec via grab())."""
    ref_frames, ref_stamps = _decode_all_py(videos[0])
    dec = MultiStreamDecoder([videos[0]], 1, (240, 320), MODE_RAW,
                             frame_stride=3)
    got, stamps = {}, {}
    while True:
        frames, _sidx, fno, st, k = dec.next_batch(4)
        if k == 0:
            break
        for b in range(k):
            got[int(fno[b])] = frames[b].copy()
            stamps[int(fno[b])] = st[b]
    dec.close()
    expect = list(range(1, len(ref_frames) + 1, 3))
    assert sorted(got) == expect
    for n in expect:
        assert np.array_equal(got[n], ref_frames[n - 1])
        np.testing.assert_allclose(stamps[n], ref_stamps[n - 1])


def test_video_batcher_frame_stride_native_python_parity(tmp_path):
    from cvsd_tpu.data.video import VideoBatcher

    p = write_test_video(str(tmp_path / "v.mp4"), num_frames=37,
                         width=320, height=240, seed=3)

    def collect(**kw):
        out = []
        for b in VideoBatcher(p, batch_size=8, frame_stride=2, **kw):
            for i in range(8):
                if b.mask[i]:
                    out.append((int(b.frame_numbers[i]),
                                float(b.timestamps_ms[i]), b.frames[i].copy()))
        return out

    a = collect(use_native_ring=False, use_native_decode=False)
    b = collect(use_native_ring=False, use_native_decode=True)
    assert [n for n, _, _ in a] == list(range(1, 38, 2))
    assert len(a) == len(b)
    for (n1, t1, f1), (n2, t2, f2) in zip(a, b):
        assert n1 == n2 and abs(t1 - t2) < 1e-6
        assert np.array_equal(f1, f2)

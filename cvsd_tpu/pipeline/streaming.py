"""Streaming end-to-end inference: decode -> detect(+pose) -> track ->
pose-window tokenize -> Shopformer anomaly score.

This is the working realization of the reference's broken real-time driver
(/root/reference/main.py:5-31 references undefined PeopleTracker /
create_dataset / hand_detector) and BASELINE.json's streaming config: whole
videos flow decode -> batched TPU detection with the pose head -> host track
association -> per-track sliding pose windows (same windowing/normalization
as the PoseLift data layer) -> batched Shopformer scoring, with frame
timestamps (CAP_PROP_POS_MSEC, main.py:25) carried through to the emitted
events. Multiple videos stream through the same jitted programs back-to-back
(one compile, N videos).
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from cvsd_tpu.data.poselift import add_neck_keypoint, normalize_sequence
from cvsd_tpu.data.video import VideoBatcher
from cvsd_tpu.eval.evaluate import ShopformerScorer
from cvsd_tpu.ops.letterbox import letterbox_params
from cvsd_tpu.pipeline.preprocess import DetectionPipeline
from cvsd_tpu.track import make_tracker
from cvsd_tpu.utils.hostmem import malloc_trim


@dataclass
class ScoreEvent:
    """One scored pose window for one tracked person."""

    video: str
    track_id: int
    frame_end: int          # last frame of the window (1-based)
    timestamp_ms: float     # CAP_PROP_POS_MSEC of the last frame
    score: float
    frames: List[int] = field(default_factory=list)


class _TrackWindow:
    """Per-track ring buffer of keypoints feeding the tokenizer.

    Frame-gap continuity mirrors the PoseLift data layer (data/poselift.py
    rejects windows containing gaps > max_gap): the tracker re-associates
    through occlusions up to max_misses frames, so without this check a
    window could stitch pre- and post-occlusion poses into one sequence the
    training distribution never contained."""

    def __init__(self, seq_len: int, stride: int, max_gap: int = 5):
        self.seq_len = seq_len
        self.stride = stride
        self.max_gap = int(max_gap)
        self.kpts: deque = deque(maxlen=seq_len)
        self.frames: deque = deque(maxlen=seq_len)
        self.stamps: deque = deque(maxlen=seq_len)
        self._since_emit = 0

    def push(self, kpts: np.ndarray, frame_no: int, stamp: float) -> Optional[Dict[str, Any]]:
        if self.frames and frame_no - self.frames[-1] > self.max_gap:
            self.kpts.clear()
            self.frames.clear()
            self.stamps.clear()
            self._since_emit = 0
        self.kpts.append(kpts)
        self.frames.append(frame_no)
        self.stamps.append(stamp)
        self._since_emit += 1
        if len(self.kpts) == self.seq_len and self._since_emit >= self.stride:
            self._since_emit = 0
            return {
                "window": np.stack(self.kpts),  # (T, V, 2)
                "frames": list(self.frames),
                "stamp": self.stamps[-1],
            }
        return None


class StreamingPipeline:
    """decode -> detect(+pose) -> track -> window -> score, batched throughout."""

    def __init__(
        self,
        config: Dict[str, Any],
        scorer: ShopformerScorer,
        detector_variables: Optional[Any] = None,
        seed: int = 0,
        pose_model: Optional[Any] = None,
        pose_variables: Optional[Any] = None,
        mesh_config: Optional[Any] = None,
    ):
        cfg = dict(config)
        # own copy of the detector subtree: mutating the caller's nested
        # dict would leak pose_head=True into configs it embeds elsewhere
        cfg["detector"] = dict(cfg.get("detector") or {})
        # streaming needs keypoints: either the detector's pose head or the
        # top-down crop pose net (detector.pose_mode == 'topdown')
        if cfg["detector"].get("pose_mode", "head") != "topdown":
            cfg["detector"]["pose_head"] = True
        self.config = cfg
        # mesh: multiplexed frame batches shard over the mesh's data axis —
        # the "shard concurrent video streams across chips" scaling story
        # (SURVEY.md §, reference serves one video per GPU process instead)
        self.detection = DetectionPipeline(cfg, variables=detector_variables, seed=seed,
                                           pose_model=pose_model,
                                           pose_variables=pose_variables,
                                           mesh_config=mesh_config)
        self.scorer = scorer
        m = scorer.config["model"]
        self.seq_len = int(m.get("seq_len", 12))
        self.num_keypoints = int(m.get("num_keypoints", 18))
        self.stride = int(scorer.config.get("data", {}).get("stride", self.seq_len // 2))
        self.max_gap = int(scorer.config.get("data", {}).get("max_gap", 5))
        self.score_batch = int(scorer.config.get("data", {}).get("batch_size", 32))
        # detection batches kept in flight before the oldest is fetched
        # (amortizes the per-batch relay round-trip; 1 = classic double-buffer)
        self.stream_depth = max(1, int(cfg["detector"].get("stream_depth", 3)))
        # frame_stride=N: detect every Nth source frame (1, 1+N, ...).
        # Skipped frames are only cap.grab()'d — the codec still advances,
        # but resize/color-convert/upload/detect/track all drop by ~N, the
        # lever against the 1-core host decode floor (PROFILE.md). The
        # tracker's Kalman motion bridges the N-frame jumps (its velocity
        # state just lives in detected-frame time units) and pose windows
        # sample at the stride; window gap tolerance scales by N so
        # continuity semantics match the stride-1 training distribution.
        self.frame_stride = max(1, int(cfg["detector"].get("frame_stride", 1)))
        # scoring gets its own in-flight queue: each Shopformer dispatch is
        # fire-and-forget up to this depth, so the score round-trip rides the
        # same pipelining as detection instead of blocking the stream loop
        self.score_depth = max(1, int(cfg["detector"].get(
            "score_stream_depth", self.stream_depth)))
        self._stage_seconds = {"read": 0.0, "detect": 0.0, "track": 0.0, "score": 0.0}

    def _prepare_window(self, window: np.ndarray) -> np.ndarray:
        """(T, 17, 2) detector keypoints -> normalized (T, V, C) model input
        (same normalization + neck synthesis as the PoseLift data layer)."""
        if self.num_keypoints == 18:
            window = np.stack([add_neck_keypoint(fr) for fr in window])
        else:
            window = window[:, : self.num_keypoints]
        return normalize_sequence(window.astype(np.float32))

    def stream_video(self, video_path: str, video_name: Optional[str] = None,
                     on_frame=None) -> Iterator[ScoreEvent]:
        """Yield ScoreEvents for one video as windows complete.

        ``on_frame(frame_no, timestamp_ms, dets)`` — optional per-frame hook
        with the tracked detections in SOURCE pixel coordinates
        (dets: list of {'track_id', 'box' (4,) xyxy, 'score', 'kpts' (17,2)
        or None}); used by the annotation writer (viz/annotate.py)."""
        name = video_name or video_path.rsplit("/", 1)[-1]
        tracker = make_tracker(self.config.get("detector"))
        windows: Dict[int, _TrackWindow] = {}
        pending: List[Dict[str, Any]] = []

        batcher = VideoBatcher(video_path, batch_size=self.detection.batch_size,
                               frame_stride=self.frame_stride)
        src_h, src_w = batcher.info.height, batcher.info.width
        size = self.detection._canvas_size(src_h, src_w)
        scale, pad_x, pad_y, _, _ = letterbox_params(src_h, src_w, size)

        for batch in batcher:
            outs = self.detection.detect_frames(batch.frames)
            boxes_src, _xywhn, scores, valid = outs[:4]
            kpts = outs[4] if len(outs) > 4 else None
            for b in range(batch.frames.shape[0]):
                if not batch.mask[b]:
                    continue
                v = valid[b]
                tracked = tracker.update_with_indices(boxes_src[b][v], scores[b][v])
                frame_no = int(batch.frame_numbers[b])
                stamp = float(batch.timestamps_ms[b])
                if kpts is None or not tracked:
                    if on_frame is not None:
                        on_frame(frame_no, stamp,
                                 [{"track_id": tid, "box": np.asarray(bx, np.float32),
                                   "score": float(sc), "kpts": None}
                                  for tid, bx, sc, _di in tracked])
                    continue
                det_kpts = kpts[b][v]  # (n, 17, 3) letterbox coords
                frame_dets = [] if on_frame is not None else None
                for track_id, _box, _score, di in tracked:
                    k = det_kpts[di][:, :2].copy()
                    k[:, 0] = (k[:, 0] - pad_x) / scale
                    k[:, 1] = (k[:, 1] - pad_y) / scale
                    if frame_dets is not None:
                        frame_dets.append({"track_id": track_id,
                                           "box": np.asarray(_box, np.float32),
                                           "score": float(_score), "kpts": k})
                    tw = windows.setdefault(
                        track_id, _TrackWindow(self.seq_len, self.stride,
                                               self.max_gap * self.frame_stride))
                    done = tw.push(k, frame_no, stamp)
                    if done is not None:
                        pending.append({"track_id": track_id, **done})
                if on_frame is not None:
                    on_frame(frame_no, stamp, frame_dets)
                # score in batches
                while len(pending) >= self.score_batch:
                    yield from self._score_pending(pending[: self.score_batch], name)
                    pending = pending[self.score_batch :]
        if pending:
            yield from self._score_pending(pending, name)

    def _score_pending(self, pending: List[Dict[str, Any]], video: str) -> Iterator[ScoreEvent]:
        arr = np.stack([self._prepare_window(p["window"]) for p in pending])
        scores = self.scorer.score(arr, batch_size=self.score_batch)
        for p, s in zip(pending, scores):
            yield ScoreEvent(
                video=video,
                track_id=int(p["track_id"]),
                frame_end=int(p["frames"][-1]),
                timestamp_ms=float(p["stamp"]),
                score=float(s),
                frames=[int(f) for f in p["frames"]],
            )

    def stream_videos_concurrent(self, video_paths: Sequence[str], max_streams: int = 8,
                                 on_event=None) -> Dict[str, Any]:
        """Multiplex frames from up to `max_streams` same-resolution videos into
        SHARED detector batches — short videos no longer leave the batch
        half-empty, so chip utilization stays high (the TPU analog of the
        reference's one-video-at-a-time loop). Per-video tracker/window state
        is kept separate; events are identical to sequential streaming.
        Mixed-resolution inputs are processed as one group per resolution.

        on_event(ScoreEvent): optional callback fired as each scored window's
        result is FETCHED (live consumers: JSONL sinks, alerting) — events
        arrive while later frames are still decoding/scoring."""
        from cvsd_tpu.data.video import video_info

        t0 = time.perf_counter()
        self._stage_seconds = {"read": 0.0, "detect": 0.0, "track": 0.0, "score": 0.0}
        groups: Dict[Tuple[int, int], List[str]] = {}
        for p in video_paths:
            try:
                info = video_info(p)
            except (FileNotFoundError, RuntimeError):
                continue
            groups.setdefault((info.height, info.width), []).append(p)
        events: List[ScoreEvent] = []
        n_frames = 0
        n_videos = 0
        for resolution, paths in groups.items():
            ev, nf, nv = self._stream_group(paths, resolution, max_streams, on_event)
            events.extend(ev)
            n_frames += nf
            n_videos += nv
        # Return freed glibc arena pages to the kernel: the per-batch host
        # churn (decode buffers, letterbox canvases, relay serialization)
        # otherwise ratchets RSS ~83 MB per 32-video pass on a long-running
        # server (round-4 soak, artifacts/soak_streaming.json; 13x reduction
        # measured by examples/leak_bisect.py --malloc-trim). ~0.1-1 ms.
        malloc_trim()
        dt = time.perf_counter() - t0
        return {
            "events": events, "videos": n_videos, "frames": n_frames,
            "skipped": len(video_paths) - n_videos,
            "seconds": dt, "fps": n_frames / dt if dt > 0 else 0.0,
            "videos_per_hour": n_videos / dt * 3600 if dt > 0 else 0.0,
            "stage_seconds": dict(self._stage_seconds),
        }

    def _stream_group(
        self, paths: Sequence[str], resolution: Tuple[int, int], max_streams: int,
        on_event=None,
    ) -> Tuple[List[ScoreEvent], int, int]:
        import cv2

        events: List[ScoreEvent] = []
        queue = list(paths)
        B = self.detection.batch_size
        size = self.detection._canvas_size(*resolution)
        # host_letterbox: resize+pad to the detector canvas on HOST (cv2,
        # GIL-released in the decode thread) and upload canvas-sized uint8 —
        # on relay-attached chips the host->device frame upload is the
        # bottleneck (~30 MB/s tunnel), and a 240p->128 canvas is 4.7x fewer
        # bytes. Boxes come back unletterboxed in source pixels either way
        # (the compiled program unmaps them); keypoints are mapped back with
        # the same per-stream scale/pad as device letterbox. cv2 INTER_LINEAR
        # vs jax.image.resize 'linear' differ in low-order bits, so this is
        # opt-in (detector.host_letterbox) rather than the default.
        host_lb = bool(self.config.get("detector", {}).get("host_letterbox", False))
        lb_content = self.detection.host_lb_content
        lb_scale, lb_px, lb_py, lb_nw, lb_nh = letterbox_params(*resolution, size)
        active: Dict[str, Dict[str, Any]] = {}
        n_frames = 0
        n_opened = 0  # videos actually decoded (unopenable paths skipped)
        # per-stage wall-clock breakdown (read/detect/track/score), exposed in
        # the stream_videos_concurrent result for throughput diagnosis
        stage = self._stage_seconds
        # native batched decode (native/video_decode.cpp): decode + resize +
        # BGR->RGB for a whole batch in ONE GIL-releasing C++ call, replacing
        # the per-frame Python loop below. Auto-on when the lib is built
        # (detector.native_decode overrides); the streams' per-frame sequences
        # and therefore the emitted events are identical either way
        # (tests/test_native_decode.py)
        use_native = self.config.get("detector", {}).get("native_decode")
        if use_native is None:
            try:
                from cvsd_tpu.native.video import video_available

                use_native = video_available()
            except Exception:
                use_native = False

        def open_next() -> bool:
            nonlocal n_opened
            while queue:
                path = queue.pop(0)
                cap = cv2.VideoCapture(path)
                if not cap.isOpened():
                    continue
                n_opened += 1
                h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                scale, pad_x, pad_y, _, _ = letterbox_params(h, w, size)
                active[path] = {
                    "cap": cap,
                    "tracker": make_tracker(self.config.get("detector")),
                    "windows": {},
                    "frame_no": 0, "scale": scale, "pad": (pad_x, pad_y),
                    "name": path.rsplit("/", 1)[-1],
                }
                return True
            return False

        if not use_native:
            while len(active) < max_streams and open_next():
                pass

        pending: List[Dict[str, Any]] = []
        pending_video: List[str] = []

        def read_batch() -> Tuple[np.ndarray, List, int]:
            """Fill one detector batch round-robin across the live streams.
            meta rows carry the stream-state dict itself, so EOF'd streams
            stay processable even after leaving `active`."""
            nonlocal n_frames
            h, w = resolution
            if host_lb:
                if lb_content:  # content-only upload; device adds the padding
                    frames = np.zeros((B, lb_nh, lb_nw, 3), np.uint8)
                else:
                    from cvsd_tpu.ops.letterbox import PAD_VALUE

                    frames = np.full((B, size, size, 3), PAD_VALUE, np.uint8)
            else:
                frames = np.zeros((B, h, w, 3), np.uint8)
            meta: List[Optional[Tuple[Dict[str, Any], int, float]]] = [None] * B
            k = 0
            order = list(active.keys())
            i = 0
            while k < B and active:
                path = order[i % len(order)] if order else None
                if path is None or path not in active:
                    order = list(active.keys())
                    if not order:
                        break
                    i = 0
                    continue
                st = active[path]
                cap = st["cap"]
                ok = True
                if st["frame_no"] > 0:  # frame_stride: advance N-1 via grab()
                    for _ in range(self.frame_stride - 1):
                        if not cap.grab():
                            ok = False
                            break
                frame = None
                if ok:
                    ok, frame = cap.read()
                if not ok:
                    st["cap"].release()
                    del active[path]
                    order = list(active.keys())
                    if open_next():
                        order = list(active.keys())
                    continue
                st["frame_no"] = 1 if st["frame_no"] == 0 else st["frame_no"] + self.frame_stride
                if host_lb:
                    r = cv2.resize(frame, (lb_nw, lb_nh), interpolation=cv2.INTER_LINEAR)
                    if lb_content:
                        frames[k] = r[..., ::-1]
                    else:
                        frames[k, lb_py:lb_py + lb_nh, lb_px:lb_px + lb_nw] = r[..., ::-1]
                else:
                    if frame.shape[:2] != (h, w):  # defensive: some codecs lie
                        frame = cv2.resize(frame, (w, h))
                    frames[k] = frame[..., ::-1]
                meta[k] = (st, st["frame_no"], float(st["cap"].get(cv2.CAP_PROP_POS_MSEC)))
                k += 1
                i += 1
                n_frames += 1
            return frames, meta, k

        dec = None
        if use_native:
            from cvsd_tpu.native.video import (MODE_CANVAS, MODE_CONTENT,
                                               MODE_RAW, MultiStreamDecoder)

            h0, w0 = resolution
            if host_lb and lb_content:
                dec = MultiStreamDecoder(queue, max_streams, (lb_nh, lb_nw),
                                         MODE_CONTENT, (lb_nh, lb_nw),
                                         frame_stride=self.frame_stride)
            elif host_lb:
                dec = MultiStreamDecoder(queue, max_streams, (size, size),
                                         MODE_CANVAS, (lb_nh, lb_nw),
                                         (lb_px, lb_py),
                                         frame_stride=self.frame_stride)
            else:
                dec = MultiStreamDecoder(queue, max_streams, (h0, w0), MODE_RAW,
                                         frame_stride=self.frame_stride)
            nstates: Dict[int, Dict[str, Any]] = {}

            def read_batch_native():
                nonlocal n_frames, n_opened
                frames, sidx, fno, stamp, k = dec.next_batch(B)
                meta: List[Optional[Tuple[Dict[str, Any], int, float]]] = [None] * B
                for b in range(k):
                    si = int(sidx[b])
                    st = nstates.get(si)
                    if st is None:
                        n_opened += 1
                        st = nstates[si] = {
                            "tracker": make_tracker(self.config.get("detector")),
                            "windows": {},
                            "scale": lb_scale, "pad": (lb_px, lb_py),
                            "name": dec.paths[si].rsplit("/", 1)[-1],
                        }
                    meta[b] = (st, int(fno[b]), float(stamp[b]))
                n_frames += k
                return frames, meta, k

            read_batch = read_batch_native

        def process(outs, meta, k: int) -> None:
            boxes_src, _xywhn, scores, valid = outs[:4]
            kpts = outs[4] if len(outs) > 4 else None
            for b in range(k):
                st, frame_no, stamp = meta[b]
                v = valid[b]
                tracked = st["tracker"].update_with_indices(boxes_src[b][v], scores[b][v])
                if kpts is None or not tracked:
                    continue
                det_kpts = kpts[b][v]
                pad_x, pad_y = st["pad"]
                for track_id, _box, _s, di in tracked:
                    kp = det_kpts[di][:, :2].copy()
                    kp[:, 0] = (kp[:, 0] - pad_x) / st["scale"]
                    kp[:, 1] = (kp[:, 1] - pad_y) / st["scale"]
                    tw = st["windows"].setdefault(
                        track_id, _TrackWindow(self.seq_len, self.stride,
                                               self.max_gap * self.frame_stride))
                    done = tw.push(kp, frame_no, stamp)
                    if done is not None:
                        pending.append({"track_id": track_id, **done})
                        pending_video.append(st["name"])

        # software pipelining: keep up to `stream_depth` detection batches in
        # flight before fetching the oldest, so device compute and the relay
        # round-trip (the dominant per-batch cost, ~25 ms+ each way) amortize
        # over D batches while the host decodes/tracks/scores. Scoring gets the
        # same treatment (its own `score_depth` in-flight queue): a Shopformer
        # dispatch used to BLOCK the loop for a full round-trip per score batch
        # — now the dispatch returns immediately and the fetch overlaps later
        # host work, so steady state pays one round-trip latency, not one per
        # batch per stage.
        from collections import deque

        inflight: deque = deque()
        score_inflight: deque = deque()

        def fetch_oldest_scores() -> None:
            dev, chunk, pv, k = score_inflight.popleft()
            s = self.scorer.fetch_scores(dev)[:k]
            fresh = [ScoreEvent(video=v, track_id=int(p["track_id"]),
                                frame_end=int(p["frames"][-1]),
                                timestamp_ms=float(p["stamp"]), score=float(sc),
                                frames=[int(f) for f in p["frames"]])
                     for p, v, sc in zip(chunk, pv, s)]
            events.extend(fresh)
            if on_event is not None:
                for e in fresh:
                    on_event(e)

        def dispatch_scores(flush: bool = False) -> None:
            SB = self.score_batch
            while len(pending) >= SB or (flush and pending):
                chunk = pending[:SB]
                pv = pending_video[:SB]
                del pending[:SB]
                del pending_video[:SB]
                arr = np.stack([self._prepare_window(p["window"]) for p in chunk])
                if arr.shape[0] < SB:  # final partial chunk: pad to the
                    #                    compiled static batch shape
                    pad = np.zeros((SB - arr.shape[0],) + arr.shape[1:], arr.dtype)
                    arr = np.concatenate([arr, pad])
                score_inflight.append(
                    (self.scorer.score_async(arr), chunk, pv, len(chunk)))
                while len(score_inflight) > self.score_depth:
                    fetch_oldest_scores()

        # decode-ahead thread (detector.decode_thread, default on): cv2 decode
        # releases the GIL, so producing batches in a worker thread overlaps
        # the C decode with GIL-bound tracking/windowing even on 1 host core;
        # batch order is preserved (single producer), so events are identical
        from cvsd_tpu.pipeline._decode_ahead import make_next_batch

        next_batch = make_next_batch(
            read_batch, stage, self.stream_depth,
            bool(self.config.get("detector", {}).get("decode_thread", True)))

        eof = False
        # grouped fetch (detector.fetch_group): each device_get costs a full
        # relay round-trip regardless of payload, so draining k batches per
        # device_get divides the round-trip tax; dispatch_ahead keeps batches
        # computing beyond the group being drained so the chip never idles
        group = max(1, self.detection.fetch_group)
        dispatch_ahead = self.stream_depth + group - 1
        while True:
            while not eof and len(inflight) < dispatch_ahead:
                frames, meta, k = next_batch()
                if k:
                    t1 = time.perf_counter()
                    if host_lb:
                        # frames are canvas-size already (read_batch); dispatch
                        # them raw — boxes come back in source coords
                        dev = self.detection.detect_canvas_async(frames, *resolution)
                    else:
                        dev = self.detection.detect_frames_async(frames)
                    inflight.append((dev, meta, k))
                    stage["detect"] += time.perf_counter() - t1
                else:
                    eof = True
            if not inflight:
                break
            g = [inflight.popleft() for _ in range(min(group, len(inflight)))]
            t2 = time.perf_counter()
            outs_list = self.detection.fetch_detections_group([x[0] for x in g])
            t3 = time.perf_counter()
            stage["detect"] += t3 - t2
            for (_dev, m, kk), outs in zip(g, outs_list):
                process(outs, m, kk)
            stage["track"] += time.perf_counter() - t3
            t4 = time.perf_counter()
            dispatch_scores()
            stage["score"] += time.perf_counter() - t4
        t5 = time.perf_counter()
        dispatch_scores(flush=True)
        while score_inflight:
            fetch_oldest_scores()
        stage["score"] += time.perf_counter() - t5
        if dec is not None:
            dec.close()
        return events, n_frames, n_opened

    @staticmethod
    def aggregate_events(events: Sequence[ScoreEvent], aggregations=("max", "mean", "percentile_95")) -> Dict[str, Dict[str, float]]:
        """Per-video anomaly scores from streaming events (same max/mean/p95
        aggregation as the offline video-level metrics,
        reference: shopformer_2/utils/metrics.py:148-188)."""
        from cvsd_tpu.utils.metrics import _AGGREGATORS

        by_video: Dict[str, List[float]] = {}
        for e in events:
            by_video.setdefault(e.video, []).append(e.score)
        return {
            video: {agg: _AGGREGATORS[agg](np.asarray(scores)) for agg in aggregations}
            for video, scores in by_video.items()
        }

    def stream_videos(self, video_paths: Sequence[str]) -> Dict[str, Any]:
        """Process many videos through the same compiled programs; returns
        events + throughput stats (videos/hour, the BASELINE.md metric)."""
        t0 = time.perf_counter()
        events: List[ScoreEvent] = []
        n_frames = 0
        from cvsd_tpu.data.video import video_info

        for path in video_paths:
            for ev in self.stream_video(path):
                events.append(ev)
            n_frames += video_info(path).num_frames
        dt = time.perf_counter() - t0
        return {
            "events": events,
            "videos": len(video_paths),
            "frames": n_frames,
            "seconds": dt,
            "fps": n_frames / dt if dt > 0 else 0.0,
            "videos_per_hour": len(video_paths) / dt * 3600 if dt > 0 else 0.0,
        }

"""UCF-Crime preprocessing pipeline: video -> batched TPU detection -> tracked
BBox CSV rows in the reference's exact schema.

Capability parity with /root/reference/preprocess.py:5-53 +
/root/reference/model.py:36-81 (the working Pipeline-A entry point), but
batched end-to-end:

    reference (per frame):   decode 1 frame -> YOLO.track (host->device->host)
                             -> BBox -> open CSV, append, close
    here (per batch):        decode B frames (prefetch thread) -> ONE jitted
                             letterbox+detect+NMS program -> host IoU/Hungarian
                             track association -> buffered CSV append

Clip ids keep the reference's counter semantics (1-based over the FULL video
list including skipped entries, preprocess.py:19-21); frame numbers are the
1-based post-read CAP_PROP_POS_FRAMES (preprocess.py:41); box coordinates are
normalized xywh like ultralytics' box.xywhn (model.py:56-67); rows route to
dataset/ucf-crime_dataset{,-normal}.csv by the 13-category anomaly list.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cvsd_tpu.data.bbox_schema import BBox, append_bboxes
from cvsd_tpu.data.ucf_crime import DEFAULT_CATEGORY_FILTER, read_train_list, route_csv
from cvsd_tpu.data.video import VideoBatcher
from cvsd_tpu.models.detector import PersonDetector, build_detector, make_detect_fn
from cvsd_tpu.ops.letterbox import letterbox_batch, letterbox_params, unletterbox_boxes
from cvsd_tpu.parallel.mesh import MeshConfig, batch_sharding, replicate
from cvsd_tpu.ops.iou import xyxy_to_xywhn
from cvsd_tpu.track import IoUTracker, make_tracker
from cvsd_tpu.utils.hostmem import malloc_trim


class DetectionPipeline:
    """Detector + fused preprocess/postprocess jitted per source resolution."""

    def __init__(self, config: Dict[str, Any], variables: Optional[Any] = None, seed: int = 0,
                 use_pallas: Optional[bool] = None, mesh_config: Optional[MeshConfig] = None,
                 pose_model: Optional[Any] = None, pose_variables: Optional[Any] = None):
        self.config = config
        self.mesh_config = mesh_config  # DP inference: frames sharded over the
        #                                 mesh's batch axis, params replicated
        d = config.get("detector", {})
        self.model: PersonDetector = build_detector(config)
        self.variables = variables if variables is not None else self.model.init_variables(
            jax.random.PRNGKey(seed)
        )
        self.conf = float(d.get("conf_threshold", 0.25))
        if str(d.get("tracker", "iou")) == "byte":
            # ByteTrack's stage-2 rescue needs the LOW-confidence boxes the
            # NMS prefilter would normally drop. The tracker gates them: low
            # detections never SPAWN tracks (that needs >= high_thresh, which
            # make_tracker raises to conf_threshold when the user set a higher
            # one), but a low box that rescues an existing track IS reported,
            # so byte mode emits CSV rows / pose windows for occluded people
            # down to tracker_low_thresh (default 0.1) — that occlusion
            # survival is the point of ByteTrack. Scores below low_thresh are
            # always dropped by the tracker even if conf_threshold is lower.
            low = float(d.get("tracker_low_thresh", 0.1))
            self.conf = min(self.conf, low)
        self.iou = float(d.get("iou_threshold", 0.45))
        self.max_det = int(d.get("max_detections", 128))
        self.batch_size = int(d.get("batch_size", 32))
        # auto_size: detect at the source's native scale instead of padding a
        # 240p frame onto a 640 canvas — the net is fully convolutional, so
        # the same weights run at any stride-64 multiple; 4x less compute on
        # UCF-Crime-sized video.
        self.auto_size = bool(d.get("auto_size", False))
        # host_letterbox: resize+pad to the canvas on HOST and upload
        # canvas-size uint8 (4.7x fewer bytes at 240p->128) — the winning mode
        # on relay-attached chips where frame upload is the bottleneck; also
        # matches the reference's own preprocessing (ultralytics letterboxes
        # with cv2 INTER_LINEAR on host). Box coords still come back in
        # source pixels (the jitted program unletterboxes with the true
        # source geometry).
        _hlb = d.get("host_letterbox", False)
        self.host_letterbox = bool(_hlb)
        # "content" sub-mode: upload ONLY the resized content rows/cols and
        # add the constant-114 padding on device (jnp.pad inside the jitted
        # program) — numerically identical to uploading the full canvas, but
        # e.g. 25% fewer bytes for 240p->128 (content is 128x96); the tunnel
        # upload is the measured preprocess/streaming bottleneck
        self.host_lb_content = _hlb == "content"
        # batches kept in flight in pipelined drivers (process_video,
        # StreamingPipeline) before the oldest is fetched
        self.stream_depth = max(1, int(d.get("stream_depth", 3)))
        # batches fetched per device_get in the multiplexed driver: each
        # device_get costs one relay round-trip (~100-200 ms) regardless of
        # payload, so grouping k fetches divides the round-trip tax by k
        self.fetch_group = max(1, int(d.get("fetch_group", 4)))
        # NMS method: the fused Pallas Jacobi-fixpoint kernel is the measured
        # winner on v5e (full postprocess 1.63 ms vs 1.95 ms vmapped XLA at
        # B=64, K=256); legacy bool use_pallas=False still selects plain XLA.
        if use_pallas is None:
            nms_method = str(d.get("nms_method", "pallas_fixpoint"))
        else:
            nms_method = "pallas_fixpoint" if use_pallas else "xla"
        # flip-TTA: per-anchor mirrored-decode averaging (2x forward) — cuts
        # keypoint regression noise ~sqrt(2); worth it when pose fidelity
        # drives downstream anomaly scores
        self.tta_flip = bool(d.get("tta_flip", False))
        # pose_mode 'topdown': keypoints from the dedicated crop-based pose
        # net (models/pose_topdown.py) fused into the same jitted program —
        # measured ~2.4x lower keypoint RMS than the one-stage head
        # (RESULTS.md). 'head' uses the detector's keypoint branch.
        self.pose_mode = str(d.get("pose_mode", "head"))
        self.pose_model = pose_model
        self.pose_variables = pose_variables
        if self.pose_mode == "topdown" and self.pose_model is None:
            ckpt = d.get("pose_topdown_checkpoint")
            if ckpt:
                from cvsd_tpu.train.pose_topdown_train import load_pose_topdown_checkpoint

                self.pose_model, self.pose_variables, _ = load_pose_topdown_checkpoint(ckpt)
            else:
                import warnings

                from cvsd_tpu.models.pose_topdown import TopDownPoseNet

                warnings.warn(
                    "detector.pose_mode='topdown' with no pose_topdown_checkpoint "
                    "and no pose_model: instantiating a RANDOMLY-INITIALIZED "
                    "TopDownPoseNet — keypoints will be garbage. Set "
                    "detector.pose_topdown_checkpoint (train/pose_topdown_train.py) "
                    "or pass pose_model/pose_variables.", RuntimeWarning)
                td = d.get("pose_topdown") or {}
                self.pose_model = TopDownPoseNet(
                    num_keypoints=int(td.get("num_keypoints", 17)),
                    width=int(td.get("width", 32)),
                    crop_size=int(td.get("crop_size", 64)),
                )
                if self.pose_variables is None:
                    self.pose_variables = self.pose_model.init_variables(
                        jax.random.PRNGKey(seed + 1))
        self._full_fns: Dict[Tuple[int, int], Any] = {}
        self._detect = make_detect_fn(self.model, self.conf, self.iou, self.max_det,
                                      nms_method=nms_method, tta_flip=self.tta_flip)
        if self.mesh_config is not None:
            mult = int(self.mesh_config.mesh.shape[self.mesh_config.batch_axis])
            if self.batch_size % mult:
                self.batch_size = ((self.batch_size + mult - 1) // mult) * mult
            self.variables = replicate(self.mesh_config.mesh, self.variables)

    def _canvas_size(self, src_h: int, src_w: int) -> int:
        if not self.auto_size:
            return self.model.img_size
        s = max(src_h, src_w)
        return int(min(max(-(-s // 64) * 64, 256), self.model.img_size))

    def _full_fn(self, src_h: int, src_w: int):
        """One jitted program: uint8 frames -> letterbox -> detect -> NMS ->
        boxes mapped back to source pixels + normalized xywh."""
        mode = ("content" if self.host_lb_content
                else "canvas" if self.host_letterbox else "device")
        key = (src_h, src_w, mode)
        if key not in self._full_fns:
            size = self._canvas_size(src_h, src_w)
            model = self.model
            conf, iou, max_det = self.conf, self.iou, self.max_det
            detect = self._detect

            pose_model, pose_variables = self.pose_model, self.pose_variables

            from cvsd_tpu.ops.letterbox import PAD_VALUE
            _scale, px, py, nw, nh = letterbox_params(src_h, src_w, size)

            def full(variables, frames):
                if mode == "canvas":
                    # frames are already canvas-size uint8 (host letterbox)
                    images = (frames.astype(jnp.float32) * (1.0 / 255.0)).astype(model.dtype)
                elif mode == "content":
                    # frames are content-only (B, nh, nw, 3) uint8; pad the
                    # constant border on device (zero upload cost)
                    canvas = jnp.pad(
                        frames,
                        ((0, 0), (py, size - py - nh), (px, size - px - nw), (0, 0)),
                        constant_values=np.uint8(PAD_VALUE))
                    images = (canvas.astype(jnp.float32) * (1.0 / 255.0)).astype(model.dtype)
                else:
                    images = letterbox_batch(frames, size=size, dtype=model.dtype)
                out = detect(variables, images)
                boxes_lb, scores, valid = out[0], out[1], out[2]
                boxes_src = unletterbox_boxes(boxes_lb, src_h, src_w, size)
                xywhn = xyxy_to_xywhn(boxes_src, float(src_w), float(src_h))
                res = (boxes_src, xywhn, scores, valid)
                if pose_model is not None:
                    # top-down pose on canvas crops, fused into the program;
                    # pose weights are closed over (small net — constants)
                    from cvsd_tpu.models.pose_topdown import pose_from_boxes

                    kpts, _ = pose_from_boxes(
                        pose_model, pose_variables, images.astype(jnp.float32),
                        boxes_lb.astype(jnp.float32))
                    res = res + (kpts,)
                elif len(out) > 3:  # one-stage pose head
                    res = res + (out[3],)
                return res

            self._full_fns[key] = jax.jit(full)
        return self._full_fns[key]

    def _host_letterbox_batch(self, frames: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 source frames -> (B, size, size, 3) uint8 canvas
        (cv2 INTER_LINEAR + gray pad — the reference's own host preprocessing)."""
        import cv2

        from cvsd_tpu.ops.letterbox import PAD_VALUE

        B, H, W, _ = frames.shape
        size = self._canvas_size(H, W)
        scale, px, py, nw, nh = letterbox_params(H, W, size)
        if self.host_lb_content:  # content-only: device adds the padding
            out = np.empty((B, nh, nw, 3), np.uint8)
            for b in range(B):
                out[b] = cv2.resize(frames[b], (nw, nh), interpolation=cv2.INTER_LINEAR)
            return out
        out = np.full((B, size, size, 3), PAD_VALUE, np.uint8)
        for b in range(B):
            out[b, py:py + nh, px:px + nw] = cv2.resize(
                frames[b], (nw, nh), interpolation=cv2.INTER_LINEAR)
        return out

    def _upload(self, frames: np.ndarray):
        if self.mesh_config is not None:
            return jax.device_put(
                frames, batch_sharding(self.mesh_config.mesh, 4, self.mesh_config.batch_axis)
            )
        return jnp.asarray(frames)

    def detect_frames(self, frames: np.ndarray):
        """(B, H, W, 3) uint8 -> host numpy (boxes_xyxy, xywhn, scores, valid[, kpts]).
        With a mesh, frames are sharded over the data axis (DP inference)."""
        return self.fetch_detections(self.detect_frames_async(frames))

    def detect_frames_async(self, frames: np.ndarray):
        """Dispatch detection and return DEVICE arrays immediately (no host
        sync) — pair with `fetch_detections` later so the device/relay round
        trip overlaps host work on the previous batch (software pipelining)."""
        B, H, W, _ = frames.shape
        if self.host_letterbox:
            return self.detect_canvas_async(self._host_letterbox_batch(frames), H, W)
        return self._full_fn(H, W)(self.variables, self._upload(frames))

    def detect_canvas_async(self, canvas_frames: np.ndarray, src_h: int, src_w: int):
        """Dispatch pre-letterboxed canvas frames (host_letterbox mode; the
        caller already resized/padded for source geometry (src_h, src_w))."""
        return self._full_fn(src_h, src_w)(self.variables, self._upload(canvas_frames))

    @staticmethod
    def fetch_detections_group(outs: Sequence[Any]):
        """Fetch SEVERAL dispatched batches' outputs in ONE device_get — on a
        relay-attached chip each device_get pays a full round-trip (~100-200
        ms) regardless of payload size (detection outputs are a few KB), so
        fetching k batches together divides the round-trip tax by k."""
        import jax

        host = jax.device_get(list(outs))
        return [tuple(np.asarray(o) for o in out) for out in host]

    @staticmethod
    def fetch_detections(out):
        """Resolve a detect_frames_async result to host numpy."""
        return tuple(np.asarray(o) for o in jax.device_get(out))


def _write_rows(csv_path: str, rows: List[BBox], clip: int, name: str,
                is_anomaly: bool, label: str) -> None:
    """Emit one video's rows: native buffered writer when built, Python csv
    fallback otherwise (byte-identical output either way)."""
    try:
        from cvsd_tpu import native

        if native.available():
            frames = np.asarray([r.frame for r in rows], np.int32)
            persons = np.asarray([r.person for r in rows], np.float64)
            ltwh = np.asarray([[r.left, r.top, r.width, r.height] for r in rows], np.float64)
            with native.NativeCsvWriter(csv_path) as w:
                w.write_video_rows(clip, name, frames, persons, ltwh, is_anomaly, label)
            return
    except Exception:
        pass
    append_bboxes(csv_path, rows)


def process_video(
    pipeline: DetectionPipeline,
    video_path: str,
    clip: int,
    label: str,
    name: str,
    csv_path: str,
    is_anomaly: bool,
    tracker: Optional[IoUTracker] = None,
) -> Dict[str, Any]:
    """One video through decode -> batched detect -> track -> CSV append.
    Returns {frames, detections, rows, seconds}."""
    tracker = tracker or make_tracker(pipeline.config.get("detector"))
    tracker.reset()
    rows: List[BBox] = []
    n_frames = 0
    n_dets = 0
    t0 = time.perf_counter()
    batcher = VideoBatcher(video_path, batch_size=pipeline.batch_size)
    src_w, src_h = batcher.info.width, batcher.info.height

    # software pipelining (same pattern as StreamingPipeline): keep up to
    # stream_depth detection batches in flight so the relay round-trip
    # overlaps decode + host tracking; order is preserved, so the tracker
    # sees frames in sequence and rows are identical to the sync loop
    from collections import deque

    inflight: deque = deque()

    def drain_one() -> None:
        nonlocal n_frames, n_dets
        dev, batch = inflight.popleft()
        outs = pipeline.fetch_detections(dev)
        boxes_src, xywhn, scores, valid = outs[:4]
        for b in range(batch.frames.shape[0]):
            if not batch.mask[b]:
                continue
            n_frames += 1
            v = valid[b]
            frame_boxes = boxes_src[b][v]
            frame_scores = scores[b][v]
            tracked = tracker.update(frame_boxes, frame_scores)
            n_dets += len(tracked)
            frame_no = int(batch.frame_numbers[b])
            for track_id, box, score in tracked:
                # normalized xywh on host (box is xyxy in source pixels)
                cx = (box[0] + box[2]) / 2.0 / src_w
                cy = (box[1] + box[3]) / 2.0 / src_h
                w = (box[2] - box[0]) / src_w
                h = (box[3] - box[1]) / src_h
                rows.append(
                    BBox(
                        clip=clip, name=name, frame=frame_no, person=float(track_id),
                        left=float(cx), top=float(cy), width=float(w), height=float(h),
                        is_anomaly=is_anomaly, anomaly=label,
                    )
                )

    for batch in batcher:
        inflight.append((pipeline.detect_frames_async(batch.frames), batch))
        if len(inflight) >= pipeline.stream_depth:
            drain_one()
    while inflight:
        drain_one()
    if rows:
        _write_rows(csv_path, rows, clip, name, is_anomaly, label)
    dt = time.perf_counter() - t0
    return {"frames": n_frames, "detections": n_dets, "rows": len(rows), "seconds": dt,
            "fps": n_frames / dt if dt > 0 else 0.0}


def process_videos_multiplexed(
    pipeline: DetectionPipeline,
    items: Sequence[Tuple[str, int, str, str, str, bool]],
    max_streams: int = 16,
) -> Dict[str, Any]:
    """Multiplex frames from up to `max_streams` same-resolution videos into
    SHARED detector batches (the preprocess analog of
    StreamingPipeline.stream_videos_concurrent): a 96-frame video fills only
    1.5 B=64 batches alone, so the sequential driver drains its in-flight
    queue at every video boundary and never reaches steady state. Round-robin
    multiplexing keeps every batch full and the pipeline primed across video
    boundaries. Per-video tracker state is independent and per-video frame
    order is preserved, so emitted rows are IDENTICAL to process_video's;
    rows are buffered per video and written in `items` order at the end, so
    CSV bytes match the sequential driver's too.

    items: (video_path, clip, label, name, csv_path, is_anomaly) per video —
    all videos must share one source resolution (group upstream).
    """
    import cv2
    from collections import deque

    t0 = time.perf_counter()
    B = pipeline.batch_size
    depth = max(1, pipeline.stream_depth)
    host_lb = pipeline.host_letterbox
    queue_items = list(items)
    # per-item buffered rows, keyed by position in `items` (write-order key)
    rows_by_item: List[List[BBox]] = [[] for _ in items]
    active: List[Dict[str, Any]] = []
    src_h = src_w = None
    lb = None  # (size, scale, px, py, nw, nh) once resolution is known
    n_frames = 0
    n_dets = 0

    def open_next() -> bool:
        nonlocal src_h, src_w, lb
        while queue_items:
            it = queue_items.pop(0)
            path = it[0]
            cap = cv2.VideoCapture(path)
            if not cap.isOpened():
                continue
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            if src_h is None:
                src_h, src_w = h, w
                if host_lb:
                    size = pipeline._canvas_size(h, w)
                    lb = (size,) + letterbox_params(h, w, size)
            elif (h, w) != (src_h, src_w):
                raise ValueError(
                    f"{path}: {h}x{w} differs from group resolution {src_h}x{src_w}; "
                    "group videos by resolution before multiplexing")
            active.append({
                "cap": cap,
                "tracker": make_tracker(pipeline.config.get("detector")),
                "frame_no": 0,
                "rows": rows_by_item[len(items) - len(queue_items) - 1],
                "clip": it[1], "label": it[2], "name": it[3], "anom": it[5],
            })
            return True
        return False

    # native batched decode (native/video_decode.cpp, see the streaming
    # pipeline's use for rationale): whole-batch decode+resize+convert in one
    # GIL-releasing C++ call; per-video frame order and therefore rows/CSV
    # bytes are identical to the Python loop
    use_native = pipeline.config.get("detector", {}).get("native_decode")
    if use_native is None:
        try:
            from cvsd_tpu.native.video import video_available

            use_native = video_available()
        except Exception:
            use_native = False

    if use_native:
        # probe every item (same mixed-resolution guard as the Python
        # open_next path raises); unopenable videos just contribute nothing
        from cvsd_tpu.data.video import video_info

        for it in items:
            try:
                info = video_info(it[0])
            except Exception:
                continue
            if src_h is None:
                src_h, src_w = info.height, info.width
            elif (info.height, info.width) != (src_h, src_w):
                raise ValueError(
                    f"{it[0]}: {info.height}x{info.width} differs from group "
                    f"resolution {src_h}x{src_w}; group videos by resolution "
                    "before multiplexing")
        if src_h is None:
            dt = time.perf_counter() - t0
            return {"rows_by_item": [[] for _ in items], "frames": 0,
                    "detections": 0, "seconds": dt, "stage_seconds": {}}
        if host_lb:
            size = pipeline._canvas_size(src_h, src_w)
            lb = (size,) + letterbox_params(src_h, src_w, size)
    else:
        while len(active) < max_streams and open_next():
            pass
        if not active:
            dt = time.perf_counter() - t0
            return {"rows_by_item": [[] for _ in items], "frames": 0,
                    "detections": 0, "seconds": dt, "stage_seconds": {}}

    content = pipeline.host_lb_content

    def read_batch():
        """Fill one detector batch round-robin across live streams; meta rows
        carry (stream-state, frame_no) so EOF'd streams stay processable."""
        nonlocal n_frames
        if host_lb:
            from cvsd_tpu.ops.letterbox import PAD_VALUE
            size, _scale, px, py, nw, nh = lb
            if content:
                frames = np.zeros((B, nh, nw, 3), np.uint8)
            else:
                frames = np.full((B, size, size, 3), PAD_VALUE, np.uint8)
        else:
            frames = np.zeros((B, src_h, src_w, 3), np.uint8)
        meta: List[Optional[Tuple[Dict[str, Any], int]]] = [None] * B
        k = 0
        i = 0
        while k < B and active:
            st = active[i % len(active)]
            ok, frame = st["cap"].read()
            if not ok:
                st["cap"].release()
                active.remove(st)
                open_next()
                continue
            st["frame_no"] += 1
            if host_lb:
                r = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR)
                if content:
                    frames[k] = r[..., ::-1]
                else:
                    frames[k, py:py + nh, px:px + nw] = r[..., ::-1]
            else:
                if frame.shape[:2] != (src_h, src_w):  # defensive: codecs lie
                    frame = cv2.resize(frame, (src_w, src_h))
                frames[k] = frame[..., ::-1]
            meta[k] = (st, st["frame_no"])
            k += 1
            i += 1
        n_frames += k
        return frames, meta, k

    dec = None
    if use_native:
        from cvsd_tpu.native.video import (MODE_CANVAS, MODE_CONTENT, MODE_RAW,
                                           MultiStreamDecoder)

        paths = [it[0] for it in items]
        if host_lb and content:
            size, _scale, px, py, nw, nh = lb
            dec = MultiStreamDecoder(paths, max_streams, (nh, nw),
                                     MODE_CONTENT, (nh, nw))
        elif host_lb:
            size, _scale, px, py, nw, nh = lb
            dec = MultiStreamDecoder(paths, max_streams, (size, size),
                                     MODE_CANVAS, (nh, nw), (px, py))
        else:
            dec = MultiStreamDecoder(paths, max_streams, (src_h, src_w), MODE_RAW)
        nstates: Dict[int, Dict[str, Any]] = {}

        def read_batch_native():
            nonlocal n_frames
            frames, sidx, fno, _stamp, k = dec.next_batch(B)
            meta: List[Optional[Tuple[Dict[str, Any], int]]] = [None] * B
            for b in range(k):
                si = int(sidx[b])
                st = nstates.get(si)
                if st is None:
                    it = items[si]
                    st = nstates[si] = {
                        "tracker": make_tracker(pipeline.config.get("detector")),
                        "rows": rows_by_item[si],
                        "clip": it[1], "label": it[2], "name": it[3],
                        "anom": it[5],
                    }
                meta[b] = (st, int(fno[b]))
            n_frames += k
            return frames, meta, k

        read_batch = read_batch_native

    def process(outs, meta, k: int) -> None:
        nonlocal n_dets
        boxes_src, _xywhn, scores, valid = outs[:4]
        for b in range(k):
            st, frame_no = meta[b]
            v = valid[b]
            tracked = st["tracker"].update(boxes_src[b][v], scores[b][v])
            n_dets += len(tracked)
            for track_id, box, _score in tracked:
                cx = (box[0] + box[2]) / 2.0 / src_w
                cy = (box[1] + box[3]) / 2.0 / src_h
                w = (box[2] - box[0]) / src_w
                h = (box[3] - box[1]) / src_h
                st["rows"].append(BBox(
                    clip=st["clip"], name=st["name"], frame=frame_no,
                    person=float(track_id), left=float(cx), top=float(cy),
                    width=float(w), height=float(h),
                    is_anomaly=st["anom"], anomaly=st["label"],
                ))

    # decode-ahead thread + in-flight dispatch queue: same software-pipeline
    # shape as StreamingPipeline._stream_group (single producer => batch order
    # preserved => rows deterministic)
    stage = {"read": 0.0, "dispatch": 0.0, "fetch": 0.0, "track": 0.0}
    from cvsd_tpu.pipeline._decode_ahead import make_next_batch

    next_batch = make_next_batch(
        read_batch, stage, depth,
        bool(pipeline.config.get("detector", {}).get("decode_thread", True)))

    inflight: deque = deque()
    eof = False
    group = max(1, pipeline.fetch_group)
    # keep `depth` batches computing BEYOND the group being drained, so the
    # chip never idles while a grouped fetch is on the wire
    dispatch_ahead = depth + group
    while True:
        while not eof and len(inflight) < dispatch_ahead:
            frames, meta, k = next_batch()
            if k:
                t1 = time.perf_counter()
                if host_lb:
                    dev = pipeline.detect_canvas_async(frames, src_h, src_w)
                else:
                    dev = pipeline.detect_frames_async(frames)
                inflight.append((dev, meta, k))
                stage["dispatch"] += time.perf_counter() - t1
            else:
                eof = True
        if not inflight:
            break
        g = [inflight.popleft() for _ in range(min(group, len(inflight)))]
        t1 = time.perf_counter()
        outs_list = pipeline.fetch_detections_group([x[0] for x in g])
        t2 = time.perf_counter()
        for (_dev, m, kk), outs in zip(g, outs_list):
            process(outs, m, kk)
        stage["fetch"] += t2 - t1
        stage["track"] += time.perf_counter() - t2
    if dec is not None:
        dec.close()
    dt = time.perf_counter() - t0
    return {"rows_by_item": rows_by_item, "frames": n_frames, "detections": n_dets,
            "seconds": dt, "stage_seconds": stage}


def preprocess_ucf_crime(
    config: Dict[str, Any],
    dataset_dir: str,
    output_dir: Optional[str] = None,
    category_filter: Sequence[str] = DEFAULT_CATEGORY_FILTER,
    train_list: str = "Anomaly_Train.txt",
    limit: Optional[int] = None,
    variables: Optional[Any] = None,
    mesh_config: Optional[MeshConfig] = None,
    verbose: bool = True,
    pipeline: Optional[DetectionPipeline] = None,
    max_streams: int = 1,
) -> Dict[str, Any]:
    """The full preprocess driver (reference: preprocess.py:5-53).
    With a mesh, frame batches shard across chips (DP inference).
    Pass `pipeline` to reuse already-compiled programs across calls.
    max_streams > 1 multiplexes that many videos into shared detector
    batches (identical CSV bytes, much higher steady-state throughput)."""
    output_dir = output_dir or dataset_dir
    entries = read_train_list(os.path.join(dataset_dir, train_list), category_filter)
    if limit:
        entries = entries[:limit]
    if pipeline is None:
        pipeline = DetectionPipeline(config, variables=variables, mesh_config=mesh_config)
    stats: Dict[str, Any] = {"videos": 0, "frames": 0, "rows": 0, "skipped": [], "seconds": 0.0}

    present = []
    for entry in entries:
        video_path = os.path.join(dataset_dir, entry.path)
        if not os.path.exists(video_path):
            if verbose:
                print(f"Failed to load video: {entry.path}")
            stats["skipped"].append(entry.path)
        else:
            present.append((entry, video_path))

    if max_streams > 1:
        from cvsd_tpu.data.video import video_info

        t0 = time.perf_counter()
        # one multiplexed pass per source resolution (entry order preserved
        # within a group; final CSV write is one pass in full entry order)
        groups: Dict[Tuple[int, int], List[Tuple[Any, str]]] = {}
        for entry, video_path in present:
            info = video_info(video_path)
            groups.setdefault((info.height, info.width), []).append((entry, video_path))
        rows_for_entry: Dict[int, List[BBox]] = {}
        for _res, group in groups.items():
            items = []
            for entry, video_path in group:
                csv_path, is_anomaly = route_csv(entry.label, output_dir)
                items.append((video_path, entry.index, entry.label, entry.name,
                              csv_path, is_anomaly))
            r = process_videos_multiplexed(pipeline, items, max_streams=max_streams)
            for (entry, _vp), rows in zip(group, r["rows_by_item"]):
                rows_for_entry[entry.index] = rows
            stats["frames"] += r["frames"]
            stats["videos"] += len(group)
            for k, v in r.get("stage_seconds", {}).items():
                stats.setdefault("stage_seconds", {}).setdefault(k, 0.0)
                stats["stage_seconds"][k] += v
        for entry, _video_path in present:
            rows = rows_for_entry.get(entry.index, [])
            stats["rows"] += len(rows)
            if rows:
                csv_path, is_anomaly = route_csv(entry.label, output_dir)
                _write_rows(csv_path, rows, entry.index, entry.name, is_anomaly,
                            entry.label)
        stats["seconds"] = time.perf_counter() - t0
        stats["fps"] = stats["frames"] / stats["seconds"] if stats["seconds"] else 0.0
        malloc_trim()  # arena hygiene for batch drivers (see utils/hostmem.py)
        return stats

    tracker = make_tracker(pipeline.config.get("detector"))
    for entry, video_path in present:
        csv_path, is_anomaly = route_csv(entry.label, output_dir)
        if verbose:
            print(f"Processing video {entry.index}: {entry.path}")
        r = process_video(pipeline, video_path, entry.index, entry.label, entry.name,
                          csv_path, is_anomaly, tracker)
        stats["videos"] += 1
        stats["frames"] += r["frames"]
        stats["rows"] += r["rows"]
        stats["seconds"] += r["seconds"]
        if verbose:
            print(f"  {r['frames']} frames, {r['rows']} rows, {r['fps']:.1f} fps")
    stats["fps"] = stats["frames"] / stats["seconds"] if stats["seconds"] else 0.0
    malloc_trim()  # arena hygiene for batch drivers (see utils/hostmem.py)
    return stats

"""Video ingestion: batched frame decode with background prefetch.

Replaces the reference's per-frame ``cv2.VideoCapture.read()`` loop
(/root/reference/preprocess.py:31-51) with a batching reader that overlaps
host decode with device compute: a producer thread decodes ahead into a
bounded queue while the TPU consumes the previous batch (double buffering).
When the native ring buffer (cvsd_tpu/native) is built, the decoded frames
land directly in its pinned buffer; otherwise a Python queue is used.

All batches have identical static shapes (pad-and-mask on the tail) so the
downstream jitted detect program never recompiles.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


@dataclass
class VideoInfo:
    width: int
    height: int
    fps: float
    num_frames: int


def video_info(path: str) -> VideoInfo:
    if not _HAS_CV2:
        raise RuntimeError("OpenCV not available")
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise FileNotFoundError(f"cannot open video {path}")
        return VideoInfo(
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=float(cap.get(cv2.CAP_PROP_FPS)),
            num_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )
    finally:
        cap.release()


@dataclass
class FrameBatch:
    frames: np.ndarray        # (B, H, W, 3) RGB uint8
    frame_numbers: np.ndarray  # (B,) int32, 1-based (CAP_PROP_POS_FRAMES after read)
    mask: np.ndarray          # (B,) bool, False on tail padding
    timestamps_ms: np.ndarray  # (B,) float64


class VideoBatcher:
    """Iterate a video as fixed-shape RGB frame batches with a prefetch thread.

    With ``use_native_ring=True`` (and the C++ lib built) decoded batches are
    staged through the native ring buffer (native/ring_buffer.cpp): the
    producer decodes straight into a preallocated slot, the consumer copies
    out and releases — bounded memory, no Python-queue object churn."""

    def __init__(self, path: str, batch_size: int = 32, prefetch: int = 2,
                 bgr_to_rgb: bool = True, use_native_ring: Optional[bool] = None,
                 use_native_decode: Optional[bool] = None, frame_stride: int = 1):
        if not _HAS_CV2:
            raise RuntimeError("OpenCV not available")
        self.path = path
        self.batch_size = int(batch_size)
        self.prefetch = int(prefetch)
        self.bgr_to_rgb = bgr_to_rgb
        # frame_stride=N yields source frames 1, 1+N, 2N+1, ...; skipped
        # frames are cap.grab()'d (codec advances, no convert/copy)
        self.frame_stride = max(1, int(frame_stride))
        self.info = video_info(path)
        # native batched decode (native/video_decode.cpp): the producer fills
        # a whole batch with one GIL-releasing C++ call instead of the
        # per-frame cv2 loop. Auto-on when the lib is built; RGB only.
        if use_native_decode is None:
            use_native_decode = bgr_to_rgb and self._native_decode_available()
        self.use_native_decode = bool(use_native_decode) and bgr_to_rgb
        if use_native_ring is None:
            # auto: use the C++ ring buffer whenever the lib is built (it
            # auto-builds on first import of cvsd_tpu.native when a toolchain
            # exists); fall back silently to the Python queue otherwise
            try:
                from cvsd_tpu import native

                use_native_ring = native.available()
            except Exception:
                use_native_ring = False
        self.use_native_ring = use_native_ring

    def __iter__(self) -> Iterator[FrameBatch]:
        if self.use_native_ring:
            yield from self._iter_native()
            return
        q: "queue.Queue[Optional[FrameBatch]]" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._producer, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
        t.join()

    @staticmethod
    def _native_decode_available() -> bool:
        try:
            from cvsd_tpu.native.video import video_available

            return video_available()
        except Exception:
            return False

    def _open_native_decoder(self):
        from cvsd_tpu.native.video import MODE_RAW, MultiStreamDecoder

        H, W = self.info.height, self.info.width
        return MultiStreamDecoder([self.path], 1, (H, W), MODE_RAW,
                                  frame_stride=self.frame_stride)

    def _iter_native(self) -> Iterator[FrameBatch]:
        from cvsd_tpu import native

        if not native.available():
            raise RuntimeError("native ring buffer requested but lib unavailable")
        H, W, B = self.info.height, self.info.width, self.batch_size
        rb = native.NativeRingBuffer(slots=self.prefetch + 1, shape=(B, H, W, 3), dtype=np.uint8)
        # sidecar metadata per slot (numbers/stamps/mask), same synchronization
        meta = {}

        def producer_msd():
            # native batched decode straight into the ring slot: one C++
            # call per batch, no Python per-frame work at all. Construct
            # INSIDE the try: a constructor failure must still close the
            # ring or the consumer blocks forever.
            dec = None
            try:
                dec = self._open_native_decoder()
                while True:
                    slot = rb.acquire_write()
                    if slot < 0:
                        return
                    frames = rb.slot(slot)
                    numbers, stamps, k = dec.next_batch_into(frames)
                    if k == 0:
                        rb.commit_write(slot)
                        meta[slot] = None
                        return
                    mask = np.zeros(B, bool)
                    mask[:k] = True
                    if k < B:
                        frames[k:] = 0  # deterministic padding (slots are reused)
                    meta[slot] = (numbers, stamps, mask)
                    rb.commit_write(slot)
                    if k < B:
                        return
            finally:
                if dec is not None:
                    dec.close()
                rb.close()

        def producer_cv2():
            cap = cv2.VideoCapture(self.path)
            try:
                if not cap.isOpened():
                    return
                frame_no = 0
                while True:
                    slot = rb.acquire_write()
                    if slot < 0:
                        return
                    frames = rb.slot(slot)
                    numbers = np.zeros(B, np.int32)
                    stamps = np.zeros(B, np.float64)
                    k = 0
                    while k < B:
                        ok = True
                        if frame_no > 0:  # frame_stride: advance via grab()
                            for _ in range(self.frame_stride - 1):
                                if not cap.grab():
                                    ok = False
                                    break
                        if ok:
                            ok, frame = cap.read()
                        if not ok:
                            break
                        frame_no = 1 if frame_no == 0 else frame_no + self.frame_stride
                        if frame.shape[:2] != (H, W):
                            frame = cv2.resize(frame, (W, H))
                        frames[k] = frame[..., ::-1] if self.bgr_to_rgb else frame
                        numbers[k] = frame_no
                        stamps[k] = cap.get(cv2.CAP_PROP_POS_MSEC)
                        k += 1
                    if k == 0:
                        rb.commit_write(slot)  # recycled by consumer via empty mask
                        meta[slot] = None
                        return
                    mask = np.zeros(B, bool)
                    mask[:k] = True
                    if k < B:
                        frames[k:] = 0  # deterministic padding (slots are reused)
                    meta[slot] = (numbers, stamps, mask)
                    rb.commit_write(slot)
                    if k < B:
                        return
            finally:
                cap.release()
                rb.close()

        producer = producer_msd if self.use_native_decode else producer_cv2

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                slot = rb.acquire_read()
                if slot < 0:
                    break
                m = meta.pop(slot, None)
                if m is None:
                    rb.release_read(slot)
                    continue
                numbers, stamps, mask = m
                yield FrameBatch(rb.slot(slot).copy(), numbers, mask, stamps)
                rb.release_read(slot)
        finally:
            t.join()
            rb.destroy()

    def _producer(self, q: "queue.Queue[Optional[FrameBatch]]") -> None:
        if self.use_native_decode:
            B = self.batch_size
            H, W = self.info.height, self.info.width
            dec = None
            try:
                dec = self._open_native_decoder()
                while True:
                    frames = np.zeros((B, H, W, 3), np.uint8)
                    numbers, stamps, k = dec.next_batch_into(frames)
                    if k == 0:
                        break
                    mask = np.zeros(B, bool)
                    mask[:k] = True
                    q.put(FrameBatch(frames, numbers, mask, stamps))
                    if k < B:
                        break
            finally:
                if dec is not None:
                    dec.close()
                q.put(None)
            return
        cap = cv2.VideoCapture(self.path)
        H, W = self.info.height, self.info.width
        B = self.batch_size
        try:
            if not cap.isOpened():
                q.put(None)
                return
            frames = np.zeros((B, H, W, 3), np.uint8)
            numbers = np.zeros(B, np.int32)
            stamps = np.zeros(B, np.float64)
            k = 0
            frame_no = 0
            while True:
                ok = True
                if frame_no > 0:  # frame_stride: advance via grab()
                    for _ in range(self.frame_stride - 1):
                        if not cap.grab():
                            ok = False
                            break
                if ok:
                    ok, frame = cap.read()
                if not ok:
                    break
                frame_no = 1 if frame_no == 0 else frame_no + self.frame_stride
                if frame.shape[:2] != (H, W):  # defensive: some codecs lie
                    frame = cv2.resize(frame, (W, H))
                frames[k] = frame[..., ::-1] if self.bgr_to_rgb else frame
                numbers[k] = frame_no
                stamps[k] = cap.get(cv2.CAP_PROP_POS_MSEC)
                k += 1
                if k == B:
                    mask = np.ones(B, bool)
                    q.put(FrameBatch(frames.copy(), numbers.copy(), mask, stamps.copy()))
                    k = 0
            if k > 0:
                mask = np.zeros(B, bool)
                mask[:k] = True
                frames[k:] = 0  # deterministic padding
                numbers[k:] = 0
                stamps[k:] = 0.0
                q.put(FrameBatch(frames.copy(), numbers.copy(), mask, stamps.copy()))
        finally:
            cap.release()
            q.put(None)


def write_test_video(path: str, num_frames: int = 48, width: int = 320, height: int = 240,
                     fps: float = 30.0, seed: int = 0) -> str:
    """Synthesize a small mp4 (moving bright rectangles on noise) — the test
    fixture standing in for UCF-Crime clips."""
    if not _HAS_CV2:
        raise RuntimeError("OpenCV not available")
    rng = np.random.default_rng(seed)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, fps, (width, height))
    try:
        for t in range(num_frames):
            frame = rng.integers(0, 60, (height, width, 3)).astype(np.uint8)
            x = int((t / max(num_frames - 1, 1)) * (width - 60))
            frame[40:140, x : x + 50] = (220, 180, 120)
            frame[height - 120 : height - 30, width - 90 : width - 40] = (120, 220, 160)
            w.write(frame)
    finally:
        w.release()
    return path

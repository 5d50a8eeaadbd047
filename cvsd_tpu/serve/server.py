"""Minimal HTTP serving endpoint for the anomaly scorer and detector.

The reference has no serving story (its real-time driver, main.py, is
broken); ultralytics users deploy behind ad-hoc wrappers. This is a
dependency-free (stdlib http.server) reference endpoint exposing the two
compiled programs over JSON/HTTP for smoke deployments and integration
tests — production fleets would run the exported StableHLO artifacts
(serve/export.py) behind their own serving infra, but the handler logic
(batching to the compiled static shapes, pad-and-mask) is the same.

Endpoints:
- GET  /healthz             -> {"status": "ok", "model": {...}}
- POST /score               <- {"poses": [[[...]]]} (N, T, V, C) normalized
                            -> {"scores": [...]}
- POST /detect              <- raw JPEG/PNG bytes (Content-Type: image/*)
                            -> {"boxes": [[x1,y1,x2,y2]...], "scores": [...]
                                [, "keypoints": ...]} in source pixels
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from cvsd_tpu.utils.hostmem import maybe_malloc_trim


class _Server(ThreadingHTTPServer):
    # stdlib default backlog is 5; 32+ concurrent clients connecting while a
    # handler thread holds a long first-compile can overflow it
    request_queue_size = 128


class ScoringServer:
    """Wraps a ShopformerScorer (+ optional DetectionPipeline) in HTTP.

    Concurrent requests are micro-batched (serve/microbatch.py): each
    endpoint has a dispatcher thread that drains every pending request into
    ONE device call, so at 32 concurrent clients the relay round-trip
    (~35 ms, the per-dispatch floor) is paid once per batch instead of once
    per request. window_ms=0 adds no latency for a lone request.
    """

    def __init__(self, scorer, detection=None, host: str = "127.0.0.1",
                 port: int = 8470, microbatch: bool = True,
                 window_ms: float = 0.0, detect_batch: int = 8,
                 max_score_items: int = 64):
        from cvsd_tpu.serve.microbatch import MicroBatcher

        self.scorer = scorer
        self.detection = detection
        self.host = host
        self.port = int(port)
        self._lock = threading.Lock()  # serialize device dispatch
        self._httpd: Optional[ThreadingHTTPServer] = None  # _Server instance
        self.detect_batch = max(1, int(detect_batch))
        self._score_mb = self._detect_mb = None
        if microbatch:
            self._score_mb = MicroBatcher(self._run_score_batch,
                                          max_items=max_score_items,
                                          window_ms=window_ms, name="score-mb")
            if detection is not None:
                self._detect_mb = MicroBatcher(self._run_detect_batch,
                                               max_items=self.detect_batch,
                                               window_ms=window_ms,
                                               name="detect-mb")

    def warmup(self) -> Dict[str, float]:
        """Compile both serving programs before accepting traffic.

        The first request otherwise pays the full XLA compile — 15-40 s
        REMOTE on the relay — inside a client's request timeout (the
        reference analogously pays ultralytics fuse + cuDNN autotune on its
        first frame, /root/reference/model.py:14-38). Dispatches one
        dummy batch through the exact static shapes live traffic uses
        (scorer.score pads to data.batch_size; micro-batched detect pads to
        detect_batch, no-microbatch detect dispatches batch 1 — warmed
        separately below), so with CVSD_COMPILE_CACHE_DIR set this also
        populates/reads the persistent cache and restarts get fast too.
        Returns per-program seconds for the startup log."""
        import time

        m = self.scorer.config.get("model", {})
        T = int(m.get("seq_len", 12))
        V = int(m.get("num_keypoints", 18))
        C = int(m.get("in_channels", 2))
        times: Dict[str, float] = {}
        t0 = time.time()
        with self._lock:
            self.scorer.score(np.zeros((1, T, V, C), np.float32))
        times["score_s"] = round(time.time() - t0, 2)
        if self.detection is not None:
            from cvsd_tpu.ops.letterbox import PAD_VALUE

            size = self.detection.model.img_size
            # warm the shape live traffic will actually dispatch: the
            # micro-batcher pads to (detect_batch, S, S, 3); the
            # --no-microbatch handler dispatches (1, S, S, 3) per request
            # (a different jit program — warming only detect_batch would
            # leave the first real /detect paying the full remote compile)
            n = self.detect_batch if self._detect_mb is not None else 1
            batch = np.full((n, size, size, 3), PAD_VALUE, np.uint8)
            t0 = time.time()
            with self._lock:
                outs = self.detection.detect_frames(batch)
                # force the device->host sync (relay-safe scalar fetch)
                float(np.asarray(outs[2]).sum())
            times["detect_s"] = round(time.time() - t0, 2)
        return times

    # -- request handlers (plain methods for testability) ---------------------

    def health(self) -> Dict[str, Any]:
        m = self.scorer.config.get("model", {})
        out = {"status": "ok",
               "model": {"variant": m.get("variant"),
                         "seq_len": m.get("seq_len"),
                         "num_keypoints": m.get("num_keypoints")},
               "detector": bool(self.detection is not None)}
        score_mb, detect_mb = self._score_mb, self._detect_mb  # vs stop() race
        if score_mb is not None:
            out["microbatch"] = {"score": score_mb.stats()}
            if detect_mb is not None:
                out["microbatch"]["detect"] = detect_mb.stats()
        return out

    # batched backends (called from the micro-batcher dispatcher threads) ----

    def _run_score_batch(self, items):
        """items: list of (Ni, T, V, C) arrays -> list of (Ni,) score arrays.
        One concatenated scorer call per gather."""
        sizes = [len(x) for x in items]
        cat = np.concatenate(items) if len(items) > 1 else items[0]
        with self._lock:
            scores = self.scorer.score(cat)
        out, off = [], 0
        for n in sizes:
            out.append(scores[off:off + n])
            off += n
        # long-running server: return freed arena pages (round-4 soak leak;
        # time-gated so it never shows in per-request latency)
        maybe_malloc_trim()
        return out

    def _run_detect_batch(self, canvases):
        """canvases: list of (S, S, 3) uint8 -> list of per-image raw outs.
        Always pads to the fixed detect_batch so exactly one program shape
        compiles (static-shape convention)."""
        k = len(canvases)
        size = self.detection.model.img_size
        batch = np.zeros((self.detect_batch, size, size, 3), np.uint8)
        for i, c in enumerate(canvases):
            batch[i] = c
        with self._lock:
            outs = self.detection.detect_frames(batch)
        results = []
        for i in range(k):
            boxes, _xywhn, scores, valid = (o[i] for o in outs[:4])
            kpts = outs[4][i] if len(outs) > 4 else None
            results.append((np.asarray(boxes), np.asarray(scores),
                            np.asarray(valid), None if kpts is None
                            else np.asarray(kpts)))
        return results

    def score(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        poses = np.asarray(payload["poses"], np.float32)
        m = self.scorer.config.get("model", {})
        T = int(m.get("seq_len", 12))
        V = int(m.get("num_keypoints", 18))
        C = int(m.get("in_channels", 2))
        # strict shape check: a mismatched window would silently retrace the
        # compiled program with different semantics
        if poses.ndim != 4 or poses.shape[1:] != (T, V, C):
            raise ValueError(
                f"poses must be (N, {T}, {V}, {C}); got {tuple(poses.shape)}")
        score_mb = self._score_mb  # snapshot vs concurrent stop()
        if score_mb is not None:
            scores = score_mb.submit(poses)
        else:
            with self._lock:
                scores = self.scorer.score(poses)
        return {"scores": [float(s) for s in scores]}

    def detect(self, image_bytes: bytes) -> Dict[str, Any]:
        if self.detection is None:
            raise ValueError("server started without a detector checkpoint")
        import cv2

        from cvsd_tpu.ops.letterbox import PAD_VALUE, letterbox_params

        img = cv2.imdecode(np.frombuffer(image_bytes, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("undecodable image payload")
        # host-letterbox every image onto ONE fixed canvas: arbitrary client
        # resolutions would otherwise each compile a fresh per-shape program
        # (static-shape convention; ~20 s per new size on a remote chip).
        # Decode + letterbox run on the REQUEST thread (parallel across
        # clients); only the device dispatch goes through the micro-batcher.
        h, w = img.shape[:2]
        size = self.detection.model.img_size
        scale, px, py, nw, nh = letterbox_params(h, w, size)
        canvas = np.full((size, size, 3), PAD_VALUE, np.uint8)
        canvas[py:py + nh, px:px + nw] = cv2.resize(
            img, (nw, nh), interpolation=cv2.INTER_LINEAR)[..., ::-1]
        detect_mb = self._detect_mb  # snapshot vs concurrent stop()
        if detect_mb is not None:
            boxes, scores, valid, kpts = detect_mb.submit(canvas)
        else:
            with self._lock:
                outs = self.detection.detect_frames(canvas[None])
            boxes = np.asarray(outs[0][0])
            scores = np.asarray(outs[2][0])
            valid = np.asarray(outs[3][0])
            kpts = np.asarray(outs[4][0]) if len(outs) > 4 else None
        keep = valid
        # unmap canvas coords -> source pixels on host
        b = np.asarray(boxes[keep], np.float64)
        b[:, [0, 2]] = (b[:, [0, 2]] - px) / scale
        b[:, [1, 3]] = (b[:, [1, 3]] - py) / scale
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        out: Dict[str, Any] = {
            "boxes": b.round(2).tolist(),
            "scores": np.asarray(scores[keep], np.float64).round(4).tolist(),
        }
        if kpts is not None:
            k = np.asarray(kpts[keep, :, :2], np.float64)
            k[..., 0] = (k[..., 0] - px) / scale
            k[..., 1] = (k[..., 1] - py) / scale
            out["keypoints"] = k.round(2).tolist()
        return out

    # -- http plumbing --------------------------------------------------------

    def _make_handler(server):  # noqa: N805 — closure over the server
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, obj: Dict[str, Any]) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, server.health())
                else:
                    self._reply(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                try:
                    if self.path == "/score":
                        self._reply(200, server.score(json.loads(body)))
                    elif self.path == "/detect":
                        self._reply(200, server.detect(body))
                    else:
                        self._reply(404, {"error": f"no route {self.path}"})
                except (ValueError, KeyError, TypeError) as e:
                    # validation problems are the client's fault
                    self._safe_error_reply(400, e)
                except Exception as e:  # noqa: BLE001 — genuine server fault
                    self._safe_error_reply(500, e)

            def _safe_error_reply(self, code: int, err: Exception) -> None:
                # the error reply itself must never kill the handler thread
                # without a trace (the client would just see a connection
                # reset); log the fault and best-effort the JSON reply
                import sys
                import traceback
                print(f"serve error ({code}): {err!r}", file=sys.stderr,
                      flush=True)
                if code >= 500:
                    traceback.print_exc()
                try:
                    self._reply(code, {"error": str(err)})
                except OSError:
                    pass  # client already gone

        return Handler

    def start(self) -> None:
        """Start serving in a background thread (returns immediately)."""
        self._httpd = _Server((self.host, self.port), self._make_handler())
        self.port = self._httpd.server_address[1]  # resolve port 0
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()

    def serve_forever(self) -> None:
        self._httpd = _Server((self.host, self.port), self._make_handler())
        self.port = self._httpd.server_address[1]
        print(f"serving on http://{self.host}:{self.port} "
              f"(/healthz /score{' /detect' if self.detection else ''})")
        self._httpd.serve_forever()

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        for mb in (self._score_mb, self._detect_mb):
            if mb is not None:
                mb.stop()
        self._score_mb = self._detect_mb = None

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


class ScoringServer:
    """Wraps a ShopformerScorer (+ optional DetectionPipeline) in HTTP."""

    def __init__(self, scorer, detection=None, host: str = "127.0.0.1",
                 port: int = 8470):
        self.scorer = scorer
        self.detection = detection
        self.host = host
        self.port = int(port)
        self._lock = threading.Lock()  # serialize device dispatch
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- request handlers (plain methods for testability) ---------------------

    def health(self) -> Dict[str, Any]:
        m = self.scorer.config.get("model", {})
        return {"status": "ok",
                "model": {"variant": m.get("variant"),
                          "seq_len": m.get("seq_len"),
                          "num_keypoints": m.get("num_keypoints")},
                "detector": bool(self.detection is not None)}

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
        # (static-shape convention; ~20 s per new size on a remote chip)
        h, w = img.shape[:2]
        size = self.detection.model.img_size
        scale, px, py, nw, nh = letterbox_params(h, w, size)
        canvas = np.full((1, size, size, 3), PAD_VALUE, np.uint8)
        canvas[0, py:py + nh, px:px + nw] = cv2.resize(
            img, (nw, nh), interpolation=cv2.INTER_LINEAR)[..., ::-1]
        with self._lock:
            outs = self.detection.detect_frames(canvas)
        boxes, _xywhn, scores, valid = outs[:4]
        keep = valid[0]
        # unmap canvas coords -> source pixels on host
        b = np.asarray(boxes[0][keep], np.float64)
        b[:, [0, 2]] = (b[:, [0, 2]] - px) / scale
        b[:, [1, 3]] = (b[:, [1, 3]] - py) / scale
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        out: Dict[str, Any] = {
            "boxes": b.round(2).tolist(),
            "scores": np.asarray(scores[0][keep], np.float64).round(4).tolist(),
        }
        if len(outs) > 4:
            k = np.asarray(outs[4][0][keep, :, :2], np.float64)
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
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 — genuine server fault
                    self._reply(500, {"error": str(e)})

        return Handler

    def start(self) -> None:
        """Start serving in a background thread (returns immediately)."""
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        self.port = self._httpd.server_address[1]  # resolve port 0
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()

    def serve_forever(self) -> None:
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        self.port = self._httpd.server_address[1]
        print(f"serving on http://{self.host}:{self.port} "
              f"(/healthz /score{' /detect' if self.detection else ''})")
        self._httpd.serve_forever()

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

from typing import Any, Dict, Optional

from cvsd_tpu.track.bytetrack import ByteTracker  # noqa: F401
from cvsd_tpu.track.tracker import IoUTracker, Track  # noqa: F401


def make_tracker(detector_cfg: Optional[Dict[str, Any]] = None):
    """Config-driven tracker factory: `detector.tracker: iou|byte`.

    'iou' (default) = Hungarian IoU association (track/tracker.py);
    'byte' = Kalman motion + two-stage ByteTrack association
    (track/bytetrack.py — what the reference's ultralytics model.track
    default actually runs)."""
    d = detector_cfg or {}
    kind = str(d.get("tracker", "iou"))
    kw = {}
    for k in ("iou_threshold", "max_misses", "min_hits"):
        if f"tracker_{k}" in d:
            kw[k] = d[f"tracker_{k}"]
    if kind == "byte":
        for k in ("high_thresh", "low_thresh"):
            if f"tracker_{k}" in d:
                kw[k] = d[f"tracker_{k}"]
        return ByteTracker(**kw)
    if kind != "iou":
        raise ValueError(f"unknown detector.tracker '{kind}' (iou|byte)")
    return IoUTracker(**kw)

from cvsd_tpu.viz.annotate import annotate_video, draw_detections

__all__ = ["annotate_video", "draw_detections"]

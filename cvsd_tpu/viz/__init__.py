from cvsd_tpu.viz.annotate import (annotate_video, annotate_video_detections,
                                   draw_detections)

__all__ = ["annotate_video", "annotate_video_detections", "draw_detections"]

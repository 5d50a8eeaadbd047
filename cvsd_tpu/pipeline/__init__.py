from cvsd_tpu.pipeline.pose_export import export_poselift_dataset, extract_pose_data  # noqa: F401
from cvsd_tpu.pipeline.preprocess import DetectionPipeline, preprocess_ucf_crime, process_video  # noqa: F401
from cvsd_tpu.pipeline.streaming import ScoreEvent, StreamingPipeline  # noqa: F401

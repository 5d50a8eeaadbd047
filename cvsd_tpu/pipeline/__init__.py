from cvsd_tpu.pipeline.preprocess import DetectionPipeline, preprocess_ucf_crime, process_video  # noqa: F401

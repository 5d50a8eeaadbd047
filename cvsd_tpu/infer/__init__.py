from cvsd_tpu.infer.inference import predict_poses, run_inference  # noqa: F401

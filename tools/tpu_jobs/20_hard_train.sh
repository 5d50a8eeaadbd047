# TIMEOUT=7200
# Hard-scene detector retrain, now reporting mAP50-95 + OKS pose mAP.
python -u examples/train_detector_hard.py \
  --save-checkpoint artifacts/hard_det.msgpack \
  --out examples/detector_hard_results.json

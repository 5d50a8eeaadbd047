# TIMEOUT=14400
# Reduced hard-scene detector retrain on CPU with mAP50-95 + OKS (hedge for
# tpu_jobs/20). Smaller canvas/steps than the TPU job: accuracy deltas only.
python -u examples/train_detector_hard.py --steps 700 --img 192 --batch 8 \
  --eval-size 96 --scan-chunk 25 \
  --save-checkpoint artifacts/hard_det_cpu.msgpack \
  --out artifacts/detector_hard_cpu.json

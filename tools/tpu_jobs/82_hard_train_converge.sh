# TIMEOUT=21600
# Detector/pose convergence run (VERDICT r4 #6): the QAT result proved the
# 1200-step float model undertrained (+0.031 AP50 from 300 extra steps).
# 4x steps + warmup-cosine tail + EMA; resumable via .partial.* checkpoints.
python -u examples/train_detector_hard.py --steps 4800 --cosine --ema 0.999 \
  --save-checkpoint artifacts/hard_det_converged.msgpack \
  --out examples/detector_converged_results.json
cp examples/detector_converged_results.json artifacts/ 2>/dev/null || true

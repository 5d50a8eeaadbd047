# TIMEOUT=1500
# 10-minute host-pipeline soak on CPU (hedge for tpu_jobs/60): exercises the
# decode/track/window threads for leaks or hangs; throughput numbers are not
# meaningful on CPU.
python -u examples/soak_streaming.py --minutes 10 --videos 8 --frames 48 \
  --img 64 --batch 4 --max-streams 4 \
  --artifact artifacts/soak_streaming_cpu.json

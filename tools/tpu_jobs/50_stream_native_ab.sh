# TIMEOUT=5400
# Native-decode A/B at the best streaming config (results in the job log).
python -u examples/bench_streaming.py --videos 64 --batch 64 --max-streams 32 \
  --host-letterbox content --native-decode on --out /tmp/bs_nd_on
python -u examples/bench_streaming.py --videos 64 --batch 64 --max-streams 32 \
  --host-letterbox content --native-decode off --out /tmp/bs_nd_off

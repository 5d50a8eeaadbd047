# TIMEOUT=27000
# Preprocess north-star A/B with and without the native decoder.
python -u examples/bench_preprocess.py --videos 32 --batch 64 \
  --host-letterbox content --max-streams 32 --native-decode on
python -u examples/bench_preprocess.py --videos 32 --batch 64 \
  --host-letterbox content --max-streams 32 --native-decode off

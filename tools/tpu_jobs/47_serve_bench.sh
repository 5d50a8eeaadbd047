# TIMEOUT=2400
# Serving micro-batch A/B: req/s at 32 concurrent clients through the relay.
python -u examples/bench_serve.py --clients 32 --requests 384 \
  --out artifacts/serve_bench.json

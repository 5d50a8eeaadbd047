# TIMEOUT=5400
# VERDICT r3 #7: profile the production point (auto-canvas 320) with the same
# cost-analysis columns as the 640 table, isolate postprocess via raw-forward,
# and probe the half-width anomaly (batch scaling + divisor points at 640).
python -u examples/bench_detector_scale.py --img 320 --batch 128 --raw-forward \
  --out artifacts/profile_320.json
python -u examples/bench_detector_scale.py --img 640 --batch 128 --raw-forward \
  --out artifacts/profile_640_raw.json
python -u examples/bench_detector_scale.py --img 640 --batch 256 --iters 4 \
  --out artifacts/profile_640_b256.json
python -u examples/bench_detector_scale.py --img 320 --batch 256 --iters 4 \
  --out artifacts/profile_320_b256.json
# push batch scaling at the production point further (VERDICT r3 #7: "if
# it's fixable, e.g. batch scaling at 320, fix it"): if B512 sustains more
# eff TFLOPS, bench.py's auto-canvas detail adopts it
python -u examples/bench_detector_scale.py --img 320 --batch 512 --iters 4 \
  --out artifacts/profile_320_b512.json || true

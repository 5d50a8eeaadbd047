# TIMEOUT=5400
# Persistent-compile-cache cold-start A/B on the relay: time-to-first-result
# of the fused letterbox->detect->NMS program in three fresh processes
# (no cache / cache write / cache hit). Measures whether the axon backend
# accepts serialized executables; see cvsd_tpu/utils/compile_cache.py.
python -u examples/bench_compile_cache.py --img 320 --batch 32 \
  --out artifacts/compile_cache_ab_r4.json

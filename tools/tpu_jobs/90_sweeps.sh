# TIMEOUT=10800
# Lowest priority: seeded sweep studies at larger train-set scale (round-3
# leftovers; only reached if everything above completed).
python -u examples/sweep_extracted.py --train-videos 256 --seeds 3 \
  --configs tok4_h64 --out artifacts/sweep_t4h64 || true
python -u examples/sweep_extracted.py --train-videos 512 --seeds 3 \
  --configs tok4 tok4_h64 --out artifacts/sweep_512

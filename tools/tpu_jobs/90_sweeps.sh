# TIMEOUT=10800
# Lowest priority: seeded sweep studies at larger train-set scale (round-3
# leftovers; only reached if everything above completed).
python -u examples/sweep_extracted.py --train-videos 256 --seeds 3 \
  --configs tok4_h64 --out /tmp/sweep_t4h64 || true
python -u examples/sweep_extracted.py --train-videos 512 --seeds 3 \
  --configs tok4 tok4_h64 --out /tmp/sweep_512
cp /tmp/sweep_t4h64/sweep_extracted.json artifacts/sweep_t4h64.json 2>/dev/null || true
cp /tmp/sweep_512/sweep_extracted.json artifacts/sweep_512.json 2>/dev/null || true

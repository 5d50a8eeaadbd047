# TIMEOUT=2400
# Re-run the headline bench at end of queue (fresh steady-state capture).
BENCH_RELAY_WAIT=120 python -u bench.py | tee artifacts/bench_r5_final.json

# TIMEOUT=2400
# Headline bench (BENCH_r04 rehearsal). Relay already probed by the runner.
BENCH_RELAY_WAIT=120 python -u bench.py | tee artifacts/bench_r4.json

# TIMEOUT=2400
# Fresh round-5 headline capture EARLY in the queue tail, so bench.py's
# relay-down/lock-held fallback reports a round-5 number even if the
# convergence train (job 82) is mid-flight at the driver's round-end run.
BENCH_RELAY_WAIT=120 python -u bench.py | tee artifacts/bench_r5.json

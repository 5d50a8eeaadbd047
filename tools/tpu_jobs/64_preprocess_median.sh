# TIMEOUT=14400
# Preprocess north star re-capture with the variance-honest protocol
# (VERDICT r4 #5): 5 repeats of BOTH legs, medians + bands, loadavg logged;
# run standalone (no catch-up preambles — the queue re-globs now).
python -u examples/bench_preprocess.py --videos 32 --batch 64 \
  --host-letterbox content --max-streams 32 --repeats 5 2>&1 \
  | tee /tmp/preproc_median.log
grep '^{' /tmp/preproc_median.log | tail -1 > artifacts/preprocess_median_r5.json
cat artifacts/preprocess_median_r5.json

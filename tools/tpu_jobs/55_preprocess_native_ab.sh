# TIMEOUT=27000
# First: catch up jobs the currently-RUNNING queue cannot see. The queue's
# for-loop glob was expanded at its 03:35 start, before 46_e2e_default.sh /
# 48_profile_points.sh were renamed into place at 03:44, so that pass skips
# them entirely; 47_serve_bench also failed once on a transient connection
# reset (client retries since added). Touching .done markers here keeps the
# queue's resumability semantics intact — same pattern as job 45's preamble.
for dep in 46_e2e_default 48_profile_points 47_serve_bench; do
  if [ ! -f "artifacts/queue_state/$dep.done" ]; then
    echo "== catch-up $dep $(date)"
    bash "tools/tpu_jobs/$dep.sh" > "artifacts/logs/$dep.log" 2>&1 \
      && touch "artifacts/queue_state/$dep.done" \
      || echo "== catch-up $dep FAILED $(date)"
  fi
done
# Preprocess north-star A/B with and without the native decoder.
python -u examples/bench_preprocess.py --videos 32 --batch 64 \
  --host-letterbox content --max-streams 32 --native-decode on
python -u examples/bench_preprocess.py --videos 32 --batch 64 \
  --host-letterbox content --max-streams 32 --native-decode off

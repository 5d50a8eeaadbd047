# TIMEOUT=14400
# First: catch up the high-value jobs 20/30 if they failed earlier this pass
# (a transient relay error killed 20_hard_train at step 650 on 2026-08-19;
# the single-pass queue would otherwise not retry them until the supervisor's
# next pass, hours away). Touching their .done markers here keeps the queue's
# resumability semantics intact.
for dep in 20_hard_train 30_int8_qat; do
  if [ ! -f "artifacts/queue_state/$dep.done" ]; then
    echo "== catch-up $dep $(date)"
    bash "tools/tpu_jobs/$dep.sh" > "artifacts/logs/$dep.log" 2>&1 \
      && touch "artifacts/queue_state/$dep.done" \
      || { echo "== catch-up $dep FAILED $(date)"; exit 1; }
  fi
done
# Frame-stride throughput A/B at the best streaming config (AUC side comes
# from job 46's e2e --frame-strides table).
for s in 1 2 3; do
  python -u examples/bench_streaming.py --videos 64 --batch 64 --max-streams 32 \
    --host-letterbox content --frame-stride $s --out /tmp/bs_fs_$s
done

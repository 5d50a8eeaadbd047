# TIMEOUT=7200
# Catch-up: 58_compile_cache_ab.sh was added after the currently-running
# queue pass globbed its job list (same stale-glob gotcha as 46/48 — the
# runner expands tools/tpu_jobs/*.sh once at launch), and lexical order
# would otherwise leave it behind the 3 h sweeps job on the NEXT pass.
# Touching the .done marker keeps the queue's resumability semantics.
if [ ! -f "artifacts/queue_state/58_compile_cache_ab.done" ]; then
  echo "== catch-up 58_compile_cache_ab $(date)"
  bash tools/tpu_jobs/58_compile_cache_ab.sh \
    > artifacts/logs/58_compile_cache_ab.log 2>&1 \
    && touch artifacts/queue_state/58_compile_cache_ab.done \
    || echo "== catch-up 58_compile_cache_ab FAILED $(date)"
fi
# 30-minute streaming soak artifact.
python -u examples/soak_streaming.py --minutes 30 --artifact artifacts/soak_streaming.json

# TIMEOUT=14400
# Frame-stride throughput A/B at the best streaming config (AUC side comes
# from job 46's e2e --frame-strides table).
for s in 1 2 3; do
  python -u examples/bench_streaming.py --videos 64 --batch 64 --max-streams 32 \
    --host-letterbox content --frame-stride $s --out /tmp/bs_fs_$s
done

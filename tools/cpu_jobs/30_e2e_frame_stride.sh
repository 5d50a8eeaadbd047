# TIMEOUT=14400
# Frame-stride AUC table on CPU at reduced scale (hedge for tpu_jobs/70's
# accuracy side; throughput numbers from this run are NOT meaningful).
python -u examples/end_to_end_synthetic.py --out artifacts/e2e_fs_cpu \
  --steps 300 --pose-steps 500 --train-videos 64 --test-videos 16 \
  --epochs 40 --frame-strides 1,2,3

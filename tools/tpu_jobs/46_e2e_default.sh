# TIMEOUT=10800
# Flagship end-to-end chain at current defaults + frame-stride AUC/throughput table.
# Working dir (videos/checkpoints/PoseLift) is scratch; only the results JSON
# is persisted into artifacts/.
python -u examples/end_to_end_synthetic.py --out /tmp/e2e_default_r4 \
  --frame-strides 1,2,3
cp /tmp/e2e_default_r4/e2e_results.json artifacts/e2e_default_r4.json

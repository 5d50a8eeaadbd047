# TIMEOUT=10800
# Flagship end-to-end chain at current defaults + frame-stride AUC/throughput table.
python -u examples/end_to_end_synthetic.py --out artifacts/e2e_default_r4 \
  --frame-strides 1,2,3

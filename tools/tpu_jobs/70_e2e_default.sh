# TIMEOUT=9000
# Flagship end-to-end chain at current defaults.
python -u examples/end_to_end_synthetic.py --out artifacts/e2e_default_r4

# TIMEOUT=7200
# Full suite including slow e2e flows.
python -m pytest tests/ -q

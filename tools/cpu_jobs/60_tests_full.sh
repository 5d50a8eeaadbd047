# TIMEOUT=7200
# PRIORITY=1
# Full suite including slow e2e flows.
python -m pytest tests/ -q

# TIMEOUT=5400
# PRIORITY=1
# Fast test subset green-check on the virtual 8-device CPU mesh.
python -m pytest tests/ -m "not slow" -q

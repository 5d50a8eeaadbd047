# TIMEOUT=9000
# Pipeline A end-to-end (detect -> bbox CSV -> XceptionTime) with window/video AUC.
python -u examples/end_to_end_pipeline_a.py --artifact artifacts/pipeline_a_results.json

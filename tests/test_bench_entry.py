"""The driver contract: bench.py prints ONE parseable JSON line with the
required keys; __graft_entry__ is importable with the two hooks."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_emits_one_json_line():
    env = dict(os.environ, BENCH_FORCE_CPU="1", BENCH_BATCH="2", BENCH_ITERS="2")
    out = subprocess.run([sys.executable, "bench.py"], capture_output=True, text=True,
                         timeout=600, env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(json_lines) == 1
    rec = json.loads(json_lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec
    assert rec["value"] > 0


def test_graft_entry_hooks_exist():
    import __graft_entry__ as g

    assert callable(g.entry)
    assert callable(g.dryrun_multichip)

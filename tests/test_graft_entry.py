import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (8,)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_odd():
    graft.dryrun_multichip(1)


def test_dryrun_routes_to_subprocess_without_touching_ambient_backend(monkeypatch):
    """MULTICHIP_r03 regression (rc=124): with a non-CPU ambient platform
    (axon relay), dryrun_multichip must go straight to the subprocess path —
    the first `jax.devices()` call on a wedged relay hangs forever, so it must
    never be made."""
    calls = []
    monkeypatch.setattr(graft, "_dryrun_multichip_subprocess", calls.append)
    monkeypatch.setattr(graft, "_ambient_platform_is_cpu", lambda: False)

    def _forbidden(*a, **k):  # a wedged relay blocks; in tests, fail loudly
        raise AssertionError("ambient jax.devices() must not be called")

    monkeypatch.setattr(jax, "devices", _forbidden)
    graft.dryrun_multichip(8)
    assert calls == [8]


def test_ambient_platform_is_cpu_in_test_process():
    # conftest pins this process to the CPU backend via jax.config, so the
    # in-process fast path must be considered safe here
    assert graft._ambient_platform_is_cpu()


@pytest.mark.slow
def test_dryrun_completes_under_axon_env_without_relay():
    """End-to-end: a child process whose JAX_PLATFORMS=axon (the driver's
    environment) must complete dryrun_multichip(8) via the self-provisioned
    CPU-mesh subprocess, regardless of whether the relay is reachable."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_from_single_device_parent():
    """Simulate the driver environment: a parent process whose jax runtime has
    ONE device must still complete dryrun_multichip(8) by re-executing on a
    virtual 8-device CPU mesh (VERDICT round 1, weak #1)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # one CPU device only: strip the conftest's forced device count
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "assert len(jax.devices()) == 1, jax.devices();\n"
        "import __graft_entry__ as g; g.dryrun_multichip(8)\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout, proc.stdout

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

"""The driver gate: ``__graft_entry__.dryrun_multichip`` must pass.

Round-1 failure mode (VERDICT.md #1): the function assumed ``n_devices``
devices already existed. It now bootstraps a virtual CPU mesh itself; under
the test environment (8 virtual CPU devices, conftest) the direct in-process
path is exercised.
"""

import os
import sys

import jax
import pytest


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)  # raises on failure


def test_dryrun_multichip_odd_mesh():
    import __graft_entry__ as g

    g.dryrun_multichip(3)  # 1-D mc mesh branch


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] > 0
    import numpy as np

    assert np.isfinite(np.asarray(out)).all()

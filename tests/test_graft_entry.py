"""Driver entry points must stay importable and runnable."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (1024,)


def test_dryrun_multichip():
    graft.dryrun_multichip(8)

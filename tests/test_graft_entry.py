"""The driver entry points keep working: single-chip compile check and the
multi-chip dry run on the virtual CPU mesh."""

import sys

import jax
import numpy as np


def test_entry_compiles_and_steps():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    fn, args = g.entry()
    out_f, out_lid = jax.jit(fn)(*args)
    assert out_f.shape == args[0].shape
    assert np.all(np.isfinite(np.asarray(out_f)))


def test_dryrun_multichip():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    g.dryrun_multichip(8)

"""
Driver artifact regression tests: entry() must jit-compile and
dryrun_multichip must execute a full data-parallel step on the virtual mesh
(these are exactly what the round driver runs).
"""
import numpy as np

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, g.NUM_LANGS)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(np.exp(out).sum(axis=1), 1.0, rtol=1e-4)


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g
    g.dryrun_multichip(2)

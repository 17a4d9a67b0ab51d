"""Driver entry points compile and run on the 8-device CPU mesh."""

import numpy as np
import pytest

# the driver runs entry/dryrun separately every round
pytestmark = pytest.mark.slow


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 1024, 5)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)

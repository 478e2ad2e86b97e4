"""Guard the driver contract: entry() compiles and dryrun_multichip runs
a DP step + BMUF round on the 8-device virtual mesh."""

import sys

import jax
import pytest

sys.path.insert(0, ".")


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 4  # (B, T', U+1, V) log-prob lattice
    assert out.shape[0] == 2


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

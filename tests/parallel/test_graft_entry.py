"""Driver entry points stay green: entry() compiles and dryrun_multichip runs a
real DPxTP train step on the virtual mesh."""

import sys

import jax
import pytest

sys.path.insert(0, ".")

import __graft_entry__ as graft


pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss = float(jax.jit(fn)(*args))
    assert loss == loss  # finite


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)

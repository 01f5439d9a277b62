"""Driver-hook tests: entry() traces/lowers; dryrun_multichip executes a
full sharded train step on the 8-device virtual mesh."""

import pytest

import jax


@pytest.mark.slow
def test_entry_lowers():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert "module" in lowered.as_text()[:200]


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally

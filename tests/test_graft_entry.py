"""Regression: the driver entry points stay importable and runnable."""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None  # traces + lowers without error


def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)

"""Driver-contract tests: entry() compile-check and dryrun_multichip on the
virtual 8-device CPU mesh."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft


def test_entry_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out["regression"].shape[0] == 1
    assert out["classification"].shape[:1] == (1,)


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    graft.dryrun_multichip(2)

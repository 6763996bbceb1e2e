"""Driver contract: entry() compiles single-chip; dryrun_multichip runs."""
import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    meta, runs = jax.block_until_ready(out)
    assert meta.shape == runs.shape
    assert meta.shape[1] == args[0].shape[0]


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    graft.dryrun_multichip(2)

"""Regression tests for the driver entry points."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    vals, idxs = jax.jit(fn)(*args)
    jax.block_until_ready((vals, idxs))
    assert vals.shape == idxs.shape
    assert vals.shape[0] == 4


def test_dryrun_multichip_8_devices():
    graft.dryrun_multichip(8)

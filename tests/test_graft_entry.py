"""Driver entry-point contract: entry() jits; dryrun_multichip bootstraps.

The driver's multi-chip gate calls ``dryrun_multichip(8)`` on a host with ONE
real chip; the entry must self-bootstrap a virtual mesh in that case
(VERDICT round 1, item 1).
"""

import sys

import jax
import numpy as np


sys.path.insert(0, ".")
import __graft_entry__ as graft  # noqa: E402


def test_entry_forward_jits():
    fn, args = graft.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (8,)
    assert np.all((out >= 0.0) & (out <= 1.0))


def test_dryrun_runs_on_native_mesh(capsys):
    # conftest forces 8 virtual devices, so n=8 runs in-process.
    graft.dryrun_multichip(8)
    assert "OK" in capsys.readouterr().out


def test_dryrun_respawns_when_devices_short(capsys):
    # n=16 > the 8 available devices: must re-exec on a 16-device virtual
    # mesh instead of crashing (the round-1 driver-gate failure mode).
    graft.dryrun_multichip(16)
    out = capsys.readouterr().out
    assert "dryrun_multichip(16)" in out and "OK" in out

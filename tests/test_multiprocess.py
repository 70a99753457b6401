"""Multi-PROCESS execution: 2 ranks x 2 CPU devices, 2x2 mesh.

Launches ``scripts/multiprocess_train.py`` (jax.distributed + Gloo
collectives — the multi-host bring-up path of ``parallel/mesh.py``) in
real subprocesses: sharded training steps, cross-host eval, and a
checkpoint round-trip of cross-process-sharded params.
"""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "multiprocess_train.py")


@pytest.mark.skipif(os.environ.get("STARGCN_SKIP_MULTIPROCESS") == "1",
                    reason="multiprocess test disabled by env")
def test_two_process_train_eval_checkpoint():
    env = dict(os.environ)
    # ranks set their own XLA flags / platform
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, SCRIPT], env=env, capture_output=True,
        text=True, timeout=540)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIPROCESS RUN PASSED" in out.stdout

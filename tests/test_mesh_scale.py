"""16/32-device virtual meshes, odd shapes (VERDICT r3 #8).

Each case launches ``scripts/mesh_scale_check.py`` in a subprocess with
its own ``--xla_force_host_platform_device_count`` (device count is
fixed at backend init, so the 8-device pytest process cannot host
these), covering square, 1xN and Nx1 meshes with node counts NOT
divisible by the model axis, plus the perfmodel-vs-HLO collective
check at both mesh sizes.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(_REPO, "scripts", "mesh_scale_check.py")


def _run(n_devices, data_ax, model_ax):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_devices}")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, SCRIPT, str(n_devices), str(data_ax),
         str(model_ax)],
        env=env, capture_output=True, text=True, timeout=540, cwd=_REPO)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "MESH SCALE OK" in out.stdout


@pytest.mark.parametrize("shape", [(16, 2, 8), (16, 16, 1), (16, 1, 16)])
def test_16_device_meshes(shape):
    _run(*shape)


def test_32_device_mesh():
    _run(32, 2, 16)

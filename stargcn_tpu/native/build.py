"""Build the native _graph_kernels extension in-place.

Equivalent role to the reference's ``GraphSampler/CMakeLists.txt`` +
``install.py`` (compile a ``-O3`` OpenMP shared library and drop it next
to the Python package), using setuptools instead of CMake so no extra
toolchain configuration is needed.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import sysconfig
import tempfile


def build(verbose: bool = False) -> str:
    """Compile graph_kernels.cpp to stargcn_tpu/native/_graph_kernels.so."""
    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "graph_kernels.cpp")
    out = os.path.join(here, "_graph_kernels" + sysconfig.get_config_var(
        "EXT_SUFFIX"))
    include_dirs = [
        sysconfig.get_paths()["include"],
        np.get_include(),
    ]
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        "-march=native",
        *[f"-I{d}" for d in include_dirs],
        src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build(verbose=True)
    print(f"built {path}")

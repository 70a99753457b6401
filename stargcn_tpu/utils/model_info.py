"""Model inspection helpers.

Parity with the reference's ``gluon_total_param_num`` /
``gluon_net_info`` (``mxgraph/utils.py:88-101``) and ``parse_ctx``
(``utils.py:65-69``) for the JAX world.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def total_param_num(params) -> int:
    """Total scalar parameter count of a pytree."""
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def model_info(params, save_path: str | None = None) -> str:
    """Human-readable per-leaf shape table (reference ``gluon_net_info``)."""
    lines = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                        for p in path)
        lines.append(f"{name}: shape={tuple(leaf.shape)} "
                     f"size={int(np.prod(leaf.shape))}")
    lines.append(f"Total #Params: {total_param_num(params)}")
    text = "\n".join(lines)
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)),
                exist_ok=True)
    with open(save_path, "w") as f:
            f.write(text + "\n")
    return text


def parse_devices(spec: str):
    """'tpu0,tpu1' / 'cpu' -> list of jax devices (reference ``parse_ctx``)."""
    spec = spec.strip()
    devices = jax.devices()
    if spec in ("", "all"):
        return devices
    out = []
    for part in spec.split(","):
        part = part.strip()
        digits = "".join(c for c in part if c.isdigit())
        idx = int(digits) if digits else 0
        out.append(devices[idx])
    return out

"""Checkpointing: params + optimizer state + host metadata.

A framework addition — the reference has effectively no checkpointing
(``net.save_parameters`` is commented out, ``STAR-GCN.py:685``).  Uses
flax msgpack serialisation; works for single-host and, via fully
replicated or addressable shards, for the mesh path.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path, params, opt_state, extra=None):
    state = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
    }
    blob = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if extra is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)
    return path


def restore_checkpoint(path, params_template, opt_state_template):
    with open(path, "rb") as f:
        blob = f.read()
    state = serialization.from_bytes(
        {"params": params_template, "opt_state": opt_state_template}, blob)
    extra = {}
    meta = path + ".meta.json"
    if os.path.exists(meta):
        with open(meta) as f:
            extra = json.load(f)
    return state["params"], state["opt_state"], extra

"""Checkpointing: params + optimizer state + host metadata.

A framework addition — the reference has effectively no checkpointing
(``net.save_parameters`` is commented out, ``STAR-GCN.py:685``).  Uses
flax msgpack serialisation.  Multi-process runs are supported: sharded
arrays whose pieces live on other hosts are assembled with a
``process_allgather`` before process 0 writes the file, and restore
re-places every leaf according to the template's sharding (so
per-process addressable shards round-trip).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization


def _fetch(leaf):
    """Device array -> full host numpy, assembling cross-process shards."""
    if not isinstance(leaf, jax.Array):
        return leaf
    if jax.process_count() > 1 and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(
            multihost_utils.process_allgather(leaf, tiled=True))
    return jax.device_get(leaf)


def save_checkpoint(path, params, opt_state, extra=None):
    state = {
        "params": jax.tree.map(_fetch, params),
        "opt_state": jax.tree.map(_fetch, opt_state),
    }
    if jax.process_index() == 0:
        blob = serialization.to_bytes(state)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        if extra is not None:
            with open(path + ".meta.json", "w") as f:
                json.dump(extra, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("stargcn_ckpt_save")
    return path


def _replace(template_leaf, value):
    """Re-place a restored numpy leaf with the template's sharding."""
    if isinstance(template_leaf, jax.Array):
        sharding = template_leaf.sharding
        if jax.process_count() > 1 and not template_leaf.is_fully_addressable:
            arr = np.asarray(value)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx])
        return jax.device_put(value, sharding)
    return value


def restore_checkpoint(path, params_template, opt_state_template):
    with open(path, "rb") as f:
        blob = f.read()
    state = serialization.from_bytes(
        {"params": params_template, "opt_state": opt_state_template}, blob)
    params = jax.tree.map(_replace, params_template, state["params"])
    opt_state = jax.tree.map(_replace, opt_state_template,
                             state["opt_state"])
    extra = {}
    meta = path + ".meta.json"
    if os.path.exists(meta):
        with open(meta) as f:
            extra = json.load(f)
    return params, opt_state, extra

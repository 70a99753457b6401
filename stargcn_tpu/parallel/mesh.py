"""Device mesh construction for multi-chip / multi-host runs.

The reference is single-process single-GPU (SURVEY.md §2.3: no DP/TP/PP,
no collective backend — ``parse_ctx`` accepts 'gpu0,gpu1' but only [0] is
used, ``experiments/STAR-GCN.py:32``).  All parallelism here is new,
TPU-native design: a ``jax.sharding.Mesh`` over ('data', 'model') axes,
with XLA inserting the collectives (psum for DP gradients and
edge-sharded partial segment sums; all-gather for row-sharded embedding
pulls) over ICI/DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data`` shards the rating/recon batch dimension (gradient psum);
    ``model`` shards the edge arrays (partial segment-sum + psum — the
    long-context analogue for graph aggregation, SURVEY.md §5) and the
    embedding-table rows.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    need = data * model
    if len(devices) < need:
        raise ValueError(
            f"mesh {data}x{model} needs {need} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (``jax.distributed.initialize``) — call once per
    host before building the mesh.  No-op for single-process runs."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)

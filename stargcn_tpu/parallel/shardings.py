"""Sharding layouts for the full-graph STAR-GCN step.

Layout (SPMD via GSPMD — annotate inputs, let XLA insert collectives):

* edge arrays + edge masks: sharded over 'model' — each chip owns an edge
  shard, computes PARTIAL per-node segment sums, and XLA combines them
  with a psum (the "edge-set sharding" design from SURVEY.md §2.3/§5:
  the structural analogue of sequence parallelism for this workload);
* embedding tables: row-sharded over 'model' (pulled together by XLA
  all-gathers where full tables are needed);
* rating/recon batches: sharded over 'data' (gradient psum = DP);
* everything else: replicated.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def place(x, sharding):
    """``device_put`` that also works when the sharding spans multiple
    PROCESSES: every process passes the FULL array and contributes only
    its addressable shards (``jax.make_array_from_callback``).  The
    convention throughout this framework is that all hosts compute
    identical batches (same seeds), so the full array is available
    everywhere."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


@dataclasses.dataclass
class GraphShardings:
    """Factory for NamedShardings over a ('data','model') mesh."""

    mesh: Mesh

    def _s(self, *spec):
        return NamedSharding(self.mesh, P(*spec))

    @property
    def edges(self):
        return self._s("model")

    @property
    def batch(self):
        return self._s("data")

    @property
    def replicated(self):
        return self._s()

    @property
    def embed_rows(self):
        return self._s("model", None)

    @property
    def bit_rows(self):
        """Bit-packed adjacency layouts (ops/bitdense.py) sharded by
        PACKED ROWS over 'model': the forward matmul's M dimension is
        embarrassingly parallel (each chip produces its destination
        slice), and the backward contraction over sharded cotangent
        rows gets its partial-sum psum from GSPMD — the dense-MXU
        instance of the edge-set sharding design (SURVEY.md §2.3)."""
        return self._s("model", None)

    def place_bit_pack(self, pack):
        """Shard every layout of a ``build_bit_pack`` dict by rows
        (replicate arrays whose row count doesn't divide the axis)."""
        model = self.mesh.shape["model"]

        def one(a):
            ok = a.shape[0] % model == 0
            return place(a, self.bit_rows if ok else self.replicated)

        return {t: {k: one(v) for k, v in d.items()}
                for t, d in pack.items()}

    def place_graph(self, graph):
        """Shard a ``BipartiteGraphData``: edge arrays over 'model';
        lookup arrays replicated (binary search stays local)."""
        return dataclasses.replace(
            graph,
            edge_user=place(graph.edge_user, self.edges),
            edge_item=place(graph.edge_item, self.edges),
            edge_rating=place(graph.edge_rating, self.edges),
            edge_pad_mask=place(graph.edge_pad_mask, self.edges),
            lookup_keys=place(graph.lookup_keys, self.replicated),
            lookup_perm=place(graph.lookup_perm, self.replicated),
        )

    def place_params(self, params, shard_embeddings: bool = True):
        """Row-shard the embedding tables over 'model'; replicate the rest."""

        def place_leaf(path, x):
            names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if (shard_embeddings and any(
                    str(n).startswith("embed_") for n in names)
                    and x.ndim == 2
                    and x.shape[0] % self.mesh.shape["model"] == 0):
                return place(x, self.embed_rows)
            return place(x, self.replicated)

        return jax.tree_util.tree_map_with_path(place_leaf, params)

    def place_batch(self, *arrays):
        return tuple(place(a, self.batch) for a in arrays)

    def place_replicated(self, *arrays):
        return tuple(place(a, self.replicated) for a in arrays)

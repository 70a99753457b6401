"""Device-side graph representation: flat, static-shape edge arrays.

This is the central TPU-first design delta from the reference (SURVEY.md
§7): instead of re-planning a variable-size computation graph on the host
every iteration (``StackedHeterGCNLayers.gen_plan``,
``mxgraph/layers/layers.py:260-337``) and shipping variable-length CSR
pieces to the device, the whole bipartite rating graph lives in HBM as
padded flat arrays, and every graph variant (train/val/test, per-batch
edge removal) is a float mask over the same arrays — so one compiled XLA
program serves every training and evaluation step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteGraphData:
    """Static-shape device arrays for a user-item multi-relational graph.

    Edge arrays are padded to a lane-friendly multiple; padded slots have
    ``edge_pad_mask == 0`` and point at node 0 / rating 0 (they contribute
    nothing because every aggregation multiplies by a support that carries
    the mask).

    Fields:
      edge_user / edge_item: ``(E_pad,)`` int32 endpoint indices.
      edge_rating: ``(E_pad,)`` int32 rating-level index in
        ``[0, num_links)``.
      edge_pad_mask: ``(E_pad,)`` float32, 1 for real edges.
      lookup_keys / lookup_perm: sorted ``user*num_items+item`` keys over
        REAL edges and the permutation back to edge positions — supports
        O(log E) in-jit pair->edge lookup for per-batch edge removal (the
        reference instead rebuilds the CSR each iteration via C++
        ``remove_edges``, ``experiments/STAR-GCN.py:595-600``).
    """

    edge_user: jax.Array
    edge_item: jax.Array
    edge_rating: jax.Array
    edge_pad_mask: jax.Array
    lookup_keys: jax.Array
    lookup_perm: jax.Array
    num_users: int = dataclasses.field(metadata=dict(static=True))
    num_items: int = dataclasses.field(metadata=dict(static=True))
    num_links: int = dataclasses.field(metadata=dict(static=True))
    # False when the pair-key space exceeds int32 (x64 is disabled on
    # device): the in-jit pair->edge lookup is then unavailable —
    # full-graph in-jit edge removal and the device sampler need it,
    # sampled mode and host-side lookups (int64 numpy) do not.
    has_pair_lookup: bool = dataclasses.field(
        default=True, metadata=dict(static=True))

    @property
    def num_edges_padded(self) -> int:
        return self.edge_user.shape[0]

    @staticmethod
    def from_arrays(users, items, ratings_idx, num_users, num_items,
                    num_links, pad_multiple: int = 256):
        """Build from COO arrays (index space, rating already level-indexed)."""
        users = np.asarray(users, dtype=np.int32)
        items = np.asarray(items, dtype=np.int32)
        ratings_idx = np.asarray(ratings_idx, dtype=np.int32)
        E = users.size
        E_pad = max(_pad_to(E, pad_multiple), pad_multiple)
        pad = E_pad - E

        edge_user = np.concatenate([users, np.zeros(pad, np.int32)])
        edge_item = np.concatenate([items, np.zeros(pad, np.int32)])
        edge_rating = np.concatenate([ratings_idx, np.zeros(pad, np.int32)])
        pad_mask = np.concatenate(
            [np.ones(E, np.float32), np.zeros(pad, np.float32)])

        # Pair keys fit int32 for every MovieLens-scale graph (x64 is
        # disabled on device, so int64 keys would wrap).  Beyond that —
        # beyond-HBM graphs trained in sampled mode — the device lookup
        # is skipped (has_pair_lookup=False); host-side lookups use
        # int64 numpy and are unaffected.
        has_lookup = (num_users + 1) * num_items + 1 < 2**31
        if has_lookup:
            keys = users.astype(np.int32) * num_items + items
            order = np.argsort(keys, kind="stable")
            # Padded lookup: sentinel key larger than any valid key so
            # that searchsorted misses resolve to a non-matching slot.
            sentinel = np.int32(num_users * num_items + 1)
            lookup_keys = np.concatenate(
                [keys[order], np.full(pad, sentinel, np.int32)])
            lookup_perm = np.concatenate(
                [order.astype(np.int32), np.zeros(pad, np.int32)])
        else:
            lookup_keys = np.zeros(1, np.int32)
            lookup_perm = np.zeros(1, np.int32)

        return BipartiteGraphData(
            edge_user=jnp.asarray(edge_user),
            edge_item=jnp.asarray(edge_item),
            edge_rating=jnp.asarray(edge_rating),
            edge_pad_mask=jnp.asarray(pad_mask),
            lookup_keys=jnp.asarray(lookup_keys),
            lookup_perm=jnp.asarray(lookup_perm),
            num_users=int(num_users),
            num_items=int(num_items),
            num_links=int(num_links),
            has_pair_lookup=bool(has_lookup),
        )

    @staticmethod
    def from_csr(csr, pad_multiple: int = 256):
        """Build from a host ``CSRMat`` (rows = users, cols = items).

        Edge rating levels come from ``csr.multi_link`` (the sorted array
        of possible rating values, reference ``graph.py:297``).
        """
        assert csr.multi_link is not None
        users = csr.row_indices
        items = csr.end_points
        rating_idx = np.searchsorted(csr.multi_link, csr.values).astype(
            np.int32)
        return BipartiteGraphData.from_arrays(
            users, items, rating_idx,
            num_users=csr.shape[0], num_items=csr.shape[1],
            num_links=len(csr.multi_link), pad_multiple=pad_multiple)

    def edge_mask_from_pairs(self, pairs_user, pairs_item, pairs_valid,
                             base_mask):
        """Zero out the edges named by (user, item) pairs — in-jit.

        The TPU-native replacement for per-iteration
        ``remove_edges_by_id`` (``STAR-GCN.py:595-600``): a binary search
        over the sorted pair keys plus one scatter.
        """
        if not self.has_pair_lookup:
            raise ValueError(
                "pair-key space exceeds int32: in-jit edge removal is "
                "unavailable at this scale — train beyond-HBM graphs in "
                "sampled mode (REMOVE_RATING exclusion happens in the "
                "host planner there)")
        q = pairs_user.astype(jnp.int32) * self.num_items + \
            pairs_item.astype(jnp.int32)
        pos = jnp.searchsorted(self.lookup_keys, q)
        pos = jnp.clip(pos, 0, self.lookup_keys.shape[0] - 1)
        hit = (self.lookup_keys[pos] == q) & (pairs_valid > 0)
        edge_idx = self.lookup_perm[pos]
        # Misses scatter a 1.0 (no-op multiply) into slot of a hit-free
        # edge would be wrong — use where to direct misses to a dummy
        # write of the existing value.
        updates = jnp.where(hit, 0.0, 1.0)
        # For misses, write back the current value instead.
        current = base_mask[edge_idx]
        return base_mask.at[edge_idx].min(
            jnp.where(hit, 0.0, current))

    def mask_from_edge_indices(self, edge_indices_np):
        """Host helper: float mask selecting only the given edge positions."""
        mask = np.zeros(self.num_edges_padded, np.float32)
        mask[np.asarray(edge_indices_np, dtype=np.int64)] = 1.0
        return jnp.asarray(mask)

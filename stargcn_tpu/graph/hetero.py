"""Heterogeneous graph: dict-of-dict of CSRMat keyed by node-type pairs.

From-scratch equivalent of the reference ``HeterGraph``
(``mxgraph/graph.py:805-1143``): forward/reverse directions share one
underlying matrix via auto-transpose, features and node ids are per type,
and edge-removal / node-subgraph operations return new graphs sharing the
feature arrays.
"""

from __future__ import annotations

import json
import os

import numpy as np

from stargcn_tpu.graph.csr import CSRMat


class HeterGraph:
    """A typed multigraph over ``CSRMat`` blocks.

    Args:
      features: ``{node_type: (num_nodes, feat_dim) float array}``.
      csr_mat_dict: ``{(src_type, dst_type): CSRMat}`` — one direction per
        pair; the reverse direction is materialised as the transpose
        (reference ``graph.py:845-857``).
      node_ids: optional ``{node_type: ids}``; defaults to
        ``arange(num_nodes)`` per type.
    """

    def __init__(self, features, csr_mat_dict, node_ids=None):
        self.features = dict(features)
        self._csr_matrices = {}
        self.meta_graph = {key: [] for key in self.features}
        for (src, dst), mat in csr_mat_dict.items():
            assert src in self.features and dst in self.features, (src, dst)
            self._csr_matrices[(src, dst)] = mat
            self._csr_matrices[(dst, src)] = mat.T
            if dst not in self.meta_graph[src]:
                self.meta_graph[src].append(dst)
            if src not in self.meta_graph[dst]:
                self.meta_graph[dst].append(src)
        if node_ids is None:
            node_ids = {
                key: np.arange(np.asarray(fea).shape[0], dtype=np.int32)
                for key, fea in self.features.items()
            }
        self.node_ids = {k: np.asarray(v, dtype=np.int32)
                         for k, v in node_ids.items()}
        self._node_id_rmaps = None

    def __getitem__(self, key):
        src, dst = key
        return self._csr_matrices[(src, dst)]

    def __contains__(self, key):
        return tuple(key) in self._csr_matrices

    @property
    def node_names(self):
        """Node-type names (reference ``graph.py:883-884``)."""
        return self.features.keys()

    @property
    def node_id_rmaps(self):
        """Per-type global-id -> index maps (reference ``graph.py:887``),
        built lazily from ``node_ids``."""
        if self._node_id_rmaps is None:
            from stargcn_tpu.graph.csr import NodeIDRMap
            self._node_id_rmaps = {k: NodeIDRMap(v)
                                   for k, v in self.node_ids.items()}
        return self._node_id_rmaps

    def node_id_to_ind(self, key, node_ids):
        """Map a type's global ids to row indices (``graph.py:917-918``)."""
        return self.node_id_rmaps[key][np.asarray(node_ids, np.int32)]

    def features_by_id(self, key, node_ids):
        """Feature rows of ``key`` selected by global id
        (``graph.py:865-881``)."""
        return np.asarray(self.features[key])[self.node_id_to_ind(key,
                                                                  node_ids)]

    def device_features(self, device=None):
        """Per-type features as device arrays — the TPU answer to the
        reference's ``gen_nd_features(ctx)`` (``graph.py:1032-1043``,
        which copies to an mxnet context): one host->HBM transfer per
        type, reused across steps."""
        import jax
        put = ((lambda x: jax.device_put(x, device)) if device is not None
               else jax.device_put)
        return {k: put(np.asarray(v, np.float32))
                for k, v in self.features.items()}

    @property
    def edge_pairs(self):
        """Canonical (src, dst) pairs (one direction per matrix)."""
        seen, out = set(), []
        for (src, dst) in self._csr_matrices:
            if (dst, src) not in seen:
                seen.add((src, dst))
                out.append((src, dst))
        return out

    def get_multi_link_structure(self):
        """{(src,dst): len(multi_link) or None}  (``graph.py:890-896``)."""
        out = {}
        for (src, dst), mat in self._csr_matrices.items():
            out[(src, dst)] = (None if mat.multi_link is None
                               else len(mat.multi_link))
        return out

    def check_continous_node_ids(self):
        """Node ids must be 0..N-1 per type (``graph.py:861``) — the model
        uses them directly as embedding rows."""
        for key, ids in self.node_ids.items():
            expected = np.arange(np.asarray(self.features[key]).shape[0],
                                 dtype=np.int32)
            if ids.size != expected.size or not np.array_equal(
                    np.sort(ids), expected):
                raise ValueError(f"node ids for {key!r} are not contiguous")

    def fetch_edges_by_id(self, src_key, dst_key, node_pair_ids):
        return self[src_key, dst_key].fetch_edges_by_id(node_pair_ids)

    def remove_edges_by_id(self, src_key, dst_key, node_pair_ids):
        """New graph without the given edges, sharing features
        (``graph.py:952-974``)."""
        new_mat = self[src_key, dst_key].remove_edges_by_id(node_pair_ids)
        csr_dict = {}
        for (s, d) in self.edge_pairs:
            csr_dict[(s, d)] = new_mat if (s, d) == (src_key, dst_key) \
                else self._csr_matrices[(s, d)]
        return HeterGraph(self.features, csr_dict, node_ids=self.node_ids)

    def sel_subgraph_by_id(self, key, node_ids):
        """Subgraph keeping only the given nodes of type ``key`` (for
        inductive splits; reference ``graph.py:1001-1030``).  Other types
        keep all nodes; the selected type's node set shrinks."""
        node_ids = np.asarray(node_ids, dtype=np.int32)
        csr_dict = {}
        for (s, d) in self.edge_pairs:
            mat = self._csr_matrices[(s, d)]
            if s == key:
                csr_dict[(s, d)] = mat.submat_by_id(row_ids=node_ids)
            elif d == key:
                csr_dict[(s, d)] = mat.submat_by_id(col_ids=node_ids)
            else:
                csr_dict[(s, d)] = mat
        new_node_ids = dict(self.node_ids)
        new_node_ids[key] = node_ids
        return HeterGraph(self.features, csr_dict, node_ids=new_node_ids)

    # ------------------------------ persistence ------------------------------

    def save(self, dirname):
        """Directory of npz files + meta_graph.json (``graph.py:898-915``)."""
        os.makedirs(dirname, exist_ok=True)
        meta = {"node_types": list(self.features.keys()),
                "edges": [list(p) for p in self.edge_pairs]}
        with open(os.path.join(dirname, "meta_graph.json"), "w") as f:
            json.dump(meta, f)
        for key, fea in self.features.items():
            np.savez_compressed(os.path.join(dirname, f"fea_{key}.npz"),
                                features=np.asarray(fea),
                                node_ids=self.node_ids[key])
        for (s, d) in self.edge_pairs:
            self._csr_matrices[(s, d)].save(
                os.path.join(dirname, f"csr_{s}__{d}.npz"))

    @staticmethod
    def load(dirname):
        with open(os.path.join(dirname, "meta_graph.json")) as f:
            meta = json.load(f)
        features, node_ids = {}, {}
        for key in meta["node_types"]:
            d = np.load(os.path.join(dirname, f"fea_{key}.npz"))
            features[key] = d["features"]
            node_ids[key] = d["node_ids"]
        csr_dict = {}
        for s, d in meta["edges"]:
            csr_dict[(s, d)] = CSRMat.load(
                os.path.join(dirname, f"csr_{s}__{d}.npz"))
        return HeterGraph(features, csr_dict, node_ids=node_ids)

    def check_consistency(self):
        """Forward/transpose agreement (``graph.py:1046-1064``)."""
        for (s, d) in self.edge_pairs:
            fwd, bwd = self._csr_matrices[(s, d)], self._csr_matrices[(d, s)]
            assert fwd.nnz == bwd.nnz
            a = fwd.node_pair_ids
            b = bwd.node_pair_ids[::-1]
            ka = np.lexsort(a)
            kb = np.lexsort(b)
            assert np.array_equal(a[:, ka], b[:, kb])
            va, vb = fwd.values[ka], bwd.values[kb]
            assert np.allclose(va, vb)

    def __repr__(self):
        lines = ["HeterGraph("]
        for key, fea in self.features.items():
            lines.append(
                f"  {key}: {self.node_ids[key].size} nodes, "
                f"feat {np.asarray(fea).shape}")
        for (s, d) in self.edge_pairs:
            lines.append(f"  ({s} -> {d}): {self._csr_matrices[(s, d)]}")
        return "\n".join(lines) + "\n)"

"""Host-side CSR matrix with global node ids and multi-link (rating) values.

A from-scratch NumPy implementation of the reference's ``CSRMat``
(``mxgraph/graph.py:261-802``) — the id-keyed sparse matrix every graph
operation flows through — plus ``merge_nodes``/``merge_node_ids_dict``
(``graph.py:142-219``).  Heavy primitives (unique-with-inverse, submatrix
slicing, edge removal, fixed-fanout sampling, per-rating splitting, support
computation) call into the native C++ extension
(``stargcn_tpu/native/graph_kernels.cpp``) when it is built, with NumPy
fallbacks so the package works before compilation.
"""

from __future__ import annotations

import numpy as np

from stargcn_tpu.graph import kernels as K


class NodeIDRMap:
    """Dense id -> index reverse map over ``[ids.min(), ids.max()]``.

    Reference: ``NodeIDRMapFast`` (``mxgraph/graph.py:122-140``).
    """

    def __init__(self, node_ids: np.ndarray):
        node_ids = np.asarray(node_ids, dtype=np.int32)
        if node_ids.size == 0:
            self._base = 0
            self._rmap = np.full((1,), -1, dtype=np.int32)
            return
        self._base = int(node_ids.min())
        size = int(node_ids.max()) - self._base + 1
        self._rmap = np.full((size,), -1, dtype=np.int32)
        self._rmap[node_ids - self._base] = np.arange(
            node_ids.size, dtype=np.int32
        )

    def __getitem__(self, node_ids):
        return self._rmap[np.asarray(node_ids, dtype=np.int32) - self._base]


# Reference exposes a plain and a dense-array "Fast" variant
# (``graph.py:109-140``); ours is the dense variant, aliased for parity.
NodeIDRMapFast = NodeIDRMap


def empty_as_zero(arrays, dtype):
    """Replace zero-length arrays with a single-zero array (reference
    ``empty_as_zero``, used when shipping per-rating CSR pieces whose
    rating level has no edges, ``mxgraph/layers/layers.py:368-371``)."""
    return [np.zeros(1, dtype=dtype) if np.asarray(a).size == 0
            else np.asarray(a, dtype=dtype) for a in arrays]


def merge_nodes(node_ids_list):
    """Dedup a list of id arrays into unique ids + per-array inverse indices.

    Reference: ``merge_nodes`` (``mxgraph/graph.py:142-163``); order of
    first occurrence is preserved (the C++ ``unique_inverse`` contract,
    ``graph_sampler.h:396-565``).
    """
    sizes = [np.asarray(ids).size for ids in node_ids_list]
    flat = np.concatenate(
        [np.asarray(ids, dtype=np.int32).ravel() for ids in node_ids_list]
    ) if sizes else np.array([], dtype=np.int32)
    uniq, inverse = K.unique_inverse(flat)
    out, start = [], 0
    for ids, size in zip(node_ids_list, sizes):
        shaped = inverse[start:start + size].reshape(np.asarray(ids).shape)
        out.append(shaped.astype(np.int32))
        start += size
    return uniq, out


def merge_node_ids_dict(node_ids_dicts):
    """Per-key merge over a list of ``{key: ids}`` dicts.

    Reference: ``merge_node_ids_dict`` (``mxgraph/graph.py:166-219``).
    Returns ``(uniq_ids_dict, [per-input {key: inverse_indices}])``.
    """
    keys = []
    for d in node_ids_dicts:
        for k in d:
            if k not in keys:
                keys.append(k)
    uniq_dict, inv_dicts = {}, [dict() for _ in node_ids_dicts]
    for key in keys:
        arrays, owners = [], []
        for i, d in enumerate(node_ids_dicts):
            if key in d:
                arrays.append(d[key])
                owners.append(i)
        uniq, inverses = merge_nodes(arrays)
        uniq_dict[key] = uniq
        for owner, inv in zip(owners, inverses):
            inv_dicts[owner][key] = inv
    return uniq_dict, inv_dicts


class NodeFeatures:
    """Feature rows bound to explicit node ids with a lazy reverse map.

    Reference: ``NodeFeatures`` (``mxgraph/graph.py:224-259``) — a device
    feature tensor + node_ids + ``take_by_id``.  Here ``data`` may be a
    NumPy or JAX array; ``take_by_id`` gathers rows by global id.
    """

    def __init__(self, data, node_ids):
        self.data = data
        self.node_ids = np.asarray(node_ids, dtype=np.int32)
        assert self.data.shape[0] == self.node_ids.shape[0]
        self._rmap = None

    @property
    def rmap(self):
        if self._rmap is None:
            self._rmap = NodeIDRMap(self.node_ids)
        return self._rmap

    def take_by_id(self, node_ids):
        idx = self.rmap[node_ids]
        assert np.all(np.asarray(idx) >= 0), "unknown node id"
        try:
            import jax.numpy as jnp

            if isinstance(self.data, jnp.ndarray):
                return jnp.take(self.data, jnp.asarray(idx), axis=0)
        except ImportError:  # pragma: no cover
            pass
        return self.data[idx]

    def __repr__(self):
        return (f"NodeFeatures(num={self.node_ids.size}, "
                f"dim={self.data.shape[1:]})")


class CSRMat:
    """CSR matrix keyed by global row/col node ids with float edge values.

    Mirrors the public surface of the reference ``CSRMat``
    (``mxgraph/graph.py:261-802``): ``multi_link`` is the sorted array of
    possible edge (rating) values, degrees/support are cached, and all
    sub-matrix / edge-removal / sampling operations return new ``CSRMat``
    objects in the same global id space.
    """

    def __init__(self, ind_ptr, end_points, values, row_ids, col_ids,
                 multi_link=None, force_contig=True):
        self.ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
        self.end_points = np.ascontiguousarray(end_points, dtype=np.int32)
        self.values = np.ascontiguousarray(values, dtype=np.float32)
        self.row_ids = np.ascontiguousarray(row_ids, dtype=np.int32)
        self.col_ids = np.ascontiguousarray(col_ids, dtype=np.int32)
        self.multi_link = (
            None if multi_link is None
            else np.sort(np.asarray(multi_link).astype(np.float32))
        )
        assert self.ind_ptr.shape[0] == self.row_ids.shape[0] + 1
        assert self.ind_ptr[0] == 0 and self.ind_ptr[-1] == self.nnz
        self._row_id_rmap = NodeIDRMap(self.row_ids)
        self._col_id_rmap = NodeIDRMap(self.col_ids)
        self._cached_row_degrees = None
        self._cached_col_degrees = None
        self._cached_support = {}
        self._cached_node_pair_ids = None

    # ---------------------------- constructors ----------------------------

    @staticmethod
    def from_spy(mat, multi_link=None):
        """Build from a ``scipy.sparse.csr_matrix`` with identity ids.

        Reference: ``CSRMat.from_spy`` (``mxgraph/graph.py``).
        """
        mat = mat.tocsr()
        return CSRMat(
            ind_ptr=mat.indptr.astype(np.int32),
            end_points=mat.indices.astype(np.int32),
            values=mat.data.astype(np.float32),
            row_ids=np.arange(mat.shape[0], dtype=np.int32),
            col_ids=np.arange(mat.shape[1], dtype=np.int32),
            multi_link=multi_link,
        )

    @staticmethod
    def from_coo(rows, cols, values, num_rows, num_cols, multi_link=None):
        """Build from COO triples in index space (identity ids)."""
        import scipy.sparse as sp

        mat = sp.coo_matrix(
            (np.asarray(values, dtype=np.float32),
             (np.asarray(rows, dtype=np.int64),
              np.asarray(cols, dtype=np.int64))),
            shape=(num_rows, num_cols),
        ).tocsr()
        return CSRMat.from_spy(mat, multi_link=multi_link)

    # ---------------------------- properties ------------------------------

    @property
    def shape(self):
        return (self.row_ids.shape[0], self.col_ids.shape[0])

    @property
    def nnz(self):
        return self.end_points.shape[0]

    @property
    def size(self):
        """Edge count (reference ``graph.py:357-358`` alias of nnz)."""
        return self.end_points.size

    def to_spy(self):
        """Export as ``scipy.sparse.csr_matrix`` (reference
        ``graph.py:325-335``; built fresh, not cached — edits to the
        returned matrix never alias this object)."""
        import scipy.sparse as sp
        # scipy does NOT copy same-dtype arrays, so copy here — otherwise
        # mutating the returned matrix would silently corrupt this graph.
        return sp.csr_matrix((self.values.copy(), self.end_points.copy(),
                              self.ind_ptr.copy()), shape=self.shape)

    def save_edges_txt(self, fname):
        """One ``row_id\\tcol_id\\tvalue`` line per edge (reference
        ``graph.py:318-323``, same format)."""
        ids = self.node_pair_ids
        with open(fname, "w") as f:
            for r, c, v in zip(ids[0], ids[1], self.values):
                f.write(f"{r}\t{c}\t{v:g}\n")

    @property
    def row_degrees(self):
        if self._cached_row_degrees is None:
            self._cached_row_degrees = np.ascontiguousarray(
                self.ind_ptr[1:] - self.ind_ptr[:-1]
            )
        return self._cached_row_degrees

    @property
    def col_degrees(self):
        if self._cached_col_degrees is None:
            deg = np.zeros(self.shape[1], dtype=np.int32)
            np.add.at(deg, self.end_points, 1)
            self._cached_col_degrees = deg
        return self._cached_col_degrees

    @property
    def row_indices(self):
        """COO row index per edge (``gen_row_indices_by_indptr`` analogue,
        ``graph_sampler.cpp:378-391``)."""
        return K.row_indices_from_indptr(self.ind_ptr, self.nnz)

    @property
    def node_pair_indices(self):
        """(2, nnz) [row_index; col_index] per edge."""
        return np.stack([self.row_indices, self.end_points], axis=0)

    @property
    def node_pair_ids(self):
        """(2, nnz) [row_id; col_id] per edge (``graph.py:390-398``)."""
        if self._cached_node_pair_ids is None:
            self._cached_node_pair_ids = np.stack(
                [self.row_ids[self.row_indices],
                 self.col_ids[self.end_points]], axis=0)
        return self._cached_node_pair_ids

    # ------------------------------ support --------------------------------

    def get_support(self, symm=True):
        """Per-edge GCN normalisation, cached per ``symm`` flag.

        Reference: ``CSRMat.get_support`` (``graph.py:414-429``) →
        C++ ``get_support`` (``graph_sampler.cpp:393-420``):
        ``1/sqrt(d_row*d_col)`` (symm) or ``1/d_row``, zeros at
        zero-degree endpoints.  Degrees are TOTAL across rating levels.
        """
        if symm not in self._cached_support:
            self._cached_support[symm] = K.get_support(
                self.row_degrees.astype(np.int32),
                self.col_degrees.astype(np.int32),
                self.ind_ptr, self.end_points, bool(symm))
        return self._cached_support[symm]

    # ---------------------------- id <-> index -----------------------------

    def row_id_to_ind(self, node_ids):
        return self._row_id_rmap[node_ids]

    def col_id_to_ind(self, node_ids):
        return self._col_id_rmap[node_ids]

    # ----------------------------- submatrix -------------------------------

    def submat(self, row_indices=None, col_indices=None):
        """Submatrix by row/col indices.  Reference ``graph.py:493-520``
        → C++ ``slice_csr_mat`` (``graph_sampler.cpp:31-152``)."""
        if row_indices is None:
            row_indices = np.arange(self.shape[0], dtype=np.int32)
        if col_indices is None:
            col_indices = np.arange(self.shape[1], dtype=np.int32)
        row_indices = np.atleast_1d(np.asarray(row_indices, dtype=np.int32))
        col_indices = np.atleast_1d(np.asarray(col_indices, dtype=np.int32))
        ind_ptr, end_points, edge_idx = K.csr_submat(
            self.ind_ptr, self.end_points, row_indices, col_indices,
            self.shape[1])
        return CSRMat(
            ind_ptr=ind_ptr, end_points=end_points,
            values=self.values[edge_idx],
            row_ids=self.row_ids[row_indices],
            col_ids=self.col_ids[col_indices],
            multi_link=self.multi_link)

    def submat_by_id(self, row_ids=None, col_ids=None):
        """Submatrix by global ids.  Reference ``graph.py:522-538``."""
        row_indices = None if row_ids is None else self.row_id_to_ind(row_ids)
        col_indices = None if col_ids is None else self.col_id_to_ind(col_ids)
        return self.submat(row_indices, col_indices)

    def sample_submat_by_id(self, row_ids=None, ncols=5, seed=None):
        """``sample_submat`` with rows selected by global id (reference
        ``graph.py:570-597``)."""
        row_indices = None if row_ids is None else self.row_id_to_ind(row_ids)
        return self.sample_submat(row_indices, ncols=ncols, seed=seed)

    def sample_submat(self, row_indices=None, ncols=5, seed=None):
        """Per-row fixed-fanout sampled submatrix (``graph.py:540-568``)."""
        if row_indices is None:
            row_indices = np.arange(self.shape[0], dtype=np.int32)
        row_indices = np.asarray(row_indices, dtype=np.int32)
        sampled_idx, ind_ptr = K.random_sample_fix_neighbor(
            self.ind_ptr, row_indices, ncols, seed=seed)
        end_points = self.end_points[sampled_idx]
        col_uniq, col_inv = K.unique_inverse(end_points)
        return CSRMat(
            ind_ptr=ind_ptr, end_points=col_inv,
            values=self.values[sampled_idx],
            row_ids=self.row_ids[row_indices],
            col_ids=self.col_ids[col_uniq],
            multi_link=self.multi_link)

    # --------------------------- edge fetching ------------------------------

    def fetch_edges_by_ind(self, node_pair_indices):
        """Edge values for (2, N) [row_index; col_index] pairs; 0 when the
        pair is not an edge (``graph.py:595-615``)."""
        node_pair_indices = np.asarray(node_pair_indices, dtype=np.int64)
        out = np.zeros(node_pair_indices.shape[1], dtype=np.float32)
        key_edges = (self.row_indices.astype(np.int64) * self.shape[1]
                     + self.end_points)
        order = np.argsort(key_edges, kind="stable")
        sorted_keys = key_edges[order]
        q = node_pair_indices[0] * self.shape[1] + node_pair_indices[1]
        pos = np.searchsorted(sorted_keys, q)
        pos = np.clip(pos, 0, sorted_keys.size - 1)
        hit = sorted_keys.size > 0
        if hit:
            found = sorted_keys[pos] == q
            out[found] = self.values[order[pos[found]]]
        return out

    def fetch_edges_by_id(self, node_pair_ids):
        """Edge values for (2, N) [row_id; col_id] pairs
        (``graph.py:617-629``)."""
        node_pair_ids = np.asarray(node_pair_ids)
        inds = np.stack([self.row_id_to_ind(node_pair_ids[0]),
                         self.col_id_to_ind(node_pair_ids[1])])
        return self.fetch_edges_by_ind(inds)

    def edge_indices_by_id(self, node_pair_ids):
        """Positions (into the edge arrays) of the given id pairs; -1 when
        absent.  Used for train-edge masking (the TPU replacement of
        ``remove_edges_by_id`` per iteration, ``STAR-GCN.py:595-600``)."""
        node_pair_ids = np.asarray(node_pair_ids)
        rows = self.row_id_to_ind(node_pair_ids[0]).astype(np.int64)
        cols = self.col_id_to_ind(node_pair_ids[1]).astype(np.int64)
        key_edges = (self.row_indices.astype(np.int64) * self.shape[1]
                     + self.end_points)
        order = np.argsort(key_edges, kind="stable")
        sorted_keys = key_edges[order]
        q = rows * self.shape[1] + cols
        pos = np.searchsorted(sorted_keys, q)
        pos = np.clip(pos, 0, max(sorted_keys.size - 1, 0))
        out = np.full(q.shape, -1, dtype=np.int64)
        if sorted_keys.size:
            found = sorted_keys[pos] == q
            out[found] = order[pos[found]]
        return out

    # --------------------------- edge removal -------------------------------

    def remove_edges_by_ind(self, node_pair_indices):
        """New CSRMat without the given edges.  Reference
        ``graph.py:631-660`` → C++ ``remove_edges``
        (``graph_sampler.cpp:154-275``)."""
        edge_idx = self.edge_indices_by_pair_indices(node_pair_indices)
        keep = np.ones(self.nnz, dtype=bool)
        keep[edge_idx[edge_idx >= 0]] = False
        return self._filter_edges(keep)

    def remove_edges_by_id(self, node_pair_ids):
        node_pair_ids = np.asarray(node_pair_ids)
        inds = np.stack([self.row_id_to_ind(node_pair_ids[0]),
                         self.col_id_to_ind(node_pair_ids[1])])
        return self.remove_edges_by_ind(inds)

    def edge_indices_by_pair_indices(self, node_pair_indices):
        node_pair_indices = np.asarray(node_pair_indices, dtype=np.int64)
        key_edges = (self.row_indices.astype(np.int64) * self.shape[1]
                     + self.end_points)
        order = np.argsort(key_edges, kind="stable")
        sorted_keys = key_edges[order]
        q = node_pair_indices[0] * self.shape[1] + node_pair_indices[1]
        pos = np.searchsorted(sorted_keys, q)
        pos = np.clip(pos, 0, max(sorted_keys.size - 1, 0))
        out = np.full(q.shape, -1, dtype=np.int64)
        if sorted_keys.size:
            found = sorted_keys[pos] == q
            out[found] = order[pos[found]]
        return out

    def _filter_edges(self, keep_mask):
        row_idx = self.row_indices[keep_mask]
        new_ind_ptr = np.zeros(self.shape[0] + 1, dtype=np.int32)
        np.add.at(new_ind_ptr[1:], row_idx, 1)
        new_ind_ptr = np.cumsum(new_ind_ptr).astype(np.int32)
        return CSRMat(
            ind_ptr=new_ind_ptr,
            end_points=self.end_points[keep_mask],
            values=self.values[keep_mask],
            row_ids=self.row_ids, col_ids=self.col_ids,
            multi_link=self.multi_link)

    # ----------------------------- transpose --------------------------------

    @property
    def T(self):
        """Transposed CSRMat (``graph.py:585-593``)."""
        import scipy.sparse as sp

        mat = sp.csr_matrix(
            (np.arange(1, self.nnz + 1, dtype=np.float64),
             self.end_points, self.ind_ptr), shape=self.shape).T.tocsr()
        perm = (mat.data - 1).astype(np.int64)
        return CSRMat(
            ind_ptr=mat.indptr.astype(np.int32),
            end_points=mat.indices.astype(np.int32),
            values=self.values[perm],
            row_ids=self.col_ids, col_ids=self.row_ids,
            multi_link=self.multi_link)

    # ----------------------------- sampling ---------------------------------

    def sample_neighbors(self, src_ids=None, symm=True, use_multi_link=True,
                         num_neighbors=None, seed=None):
        """Fanout-capped neighbor sampling + per-rating split.

        Reference: ``CSRMat.sample_neighbors`` (``graph.py:677-748``).
        Support values come from ``get_support`` of THIS matrix (before
        sampling/splitting), matching ``graph.py:731``.

        Returns ``(end_points_ids, edge_values, ind_ptr, support)`` — each
        a list with one entry per rating level when ``use_multi_link``.
        """
        if src_ids is not None:
            src_inds = self.row_id_to_ind(src_ids).astype(np.int32)
        else:
            src_inds = np.arange(self.shape[0], dtype=np.int32)
        if num_neighbors is None:
            num_neighbors = -1
        sampled_idx, dst_ind_ptr = K.random_sample_fix_neighbor(
            self.ind_ptr, src_inds, int(num_neighbors), seed=seed)
        end_points_ids = self.col_ids[self.end_points[sampled_idx]]
        edge_values = self.values[sampled_idx]
        support = self.get_support(symm)[sampled_idx]
        if not use_multi_link:
            return end_points_ids, edge_values, dst_ind_ptr, support
        assert self.multi_link is not None
        split_indices, ind_ptr_l = K.multi_link_split(
            edge_values, dst_ind_ptr, self.multi_link)
        return (
            [end_points_ids[s] for s in split_indices],
            [edge_values[s] for s in split_indices],
            ind_ptr_l,
            [support[s] for s in split_indices],
        )

    # -------------------------- persistence / checks ------------------------

    def save(self, fname):
        np.savez_compressed(
            fname, row_ids=self.row_ids, col_ids=self.col_ids,
            values=self.values, ind_ptr=self.ind_ptr,
            end_points=self.end_points,
            multi_link=(np.array([]) if self.multi_link is None
                        else self.multi_link))

    @staticmethod
    def load(fname):
        d = np.load(fname)
        ml = d["multi_link"]
        return CSRMat(
            ind_ptr=d["ind_ptr"], end_points=d["end_points"],
            values=d["values"], row_ids=d["row_ids"], col_ids=d["col_ids"],
            multi_link=None if ml.size == 0 else ml)

    def issubmat(self, other) -> bool:
        """True if every edge of ``self`` exists in ``other`` with the
        same value (reference ``issubmat``, ``graph.py:757-790``)."""
        if not (set(self.row_ids.tolist()) <= set(other.row_ids.tolist())
                and set(self.col_ids.tolist())
                <= set(other.col_ids.tolist())):
            return False
        vals = other.fetch_edges_by_id(self.node_pair_ids)
        return bool(np.allclose(vals, self.values))

    def check_consistency(self):
        """Runtime invariants (reference ``graph.py:751-790``): no duplicate
        end points within a row, indptr monotone, indices in range."""
        assert np.all(np.diff(self.ind_ptr) >= 0)
        assert self.nnz == 0 or self.end_points.max() < self.shape[1]
        for i in range(self.shape[0]):
            seg = self.end_points[self.ind_ptr[i]:self.ind_ptr[i + 1]]
            assert np.unique(seg).size == seg.size, f"dup endpoints row {i}"

    def __repr__(self):
        return (f"CSRMat(shape={self.shape}, nnz={self.nnz}, "
                f"multi_link={None if self.multi_link is None else list(self.multi_link)})")

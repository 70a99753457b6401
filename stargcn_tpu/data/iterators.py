"""Training/evaluation samplers and graph-hierarchy bookkeeping.

From-scratch equivalent of the reference ``DataIterator`` /
``NegEdgeGenerator`` (``mxgraph/iterators.py``), preserving the exact
masking semantics that drive RMSE parity:

* graph hierarchy (``iterators.py:165-176``): ``test_graph = all - test
  edges``; transductive ``val_graph = test_graph - valid edges =
  train_graph``; inductive ``val_graph = subgraph(train+valid nodes) -
  valid edges`` and ``train_graph = subgraph(train nodes)``;
* ``rating_sampler`` (``iterators.py:264-307``): infinite random batches
  for train, sequential batches for eval;
* ``recon_nodes_sampler`` (``iterators.py:309-370``): per epoch sample a
  ``P_mask`` fraction of each node type, choose mask type zero(-1)/self by
  ``(p_zero, p_self)``, and emit a full-size ``embed_noise`` int32 array
  (-1 = zero-mask, else the node's own id) — nodes absent from the train
  graph are always -1;
* ``evaluate_embed_noise_dict`` (``iterators.py:228-236``): at eval, nodes
  unseen in the train graph are masked to zero — the inductive cold-start
  mechanism.

One reference defect is not replicated: ``assert segment is 'train'``
identity-compare (``iterators.py:324``) becomes ``==``.
"""

from __future__ import annotations

import numpy as np


class NegEdgeGenerator:
    """O(1) uniform negative-edge sampling via a swap-remap (Fisher-Yates
    style perfect sampling over non-edges).

    Reference: ``NegEdgeGenerator`` (``mxgraph/iterators.py:5-111``).
    For each row, the first ``row_degree`` slots of a virtual permutation
    of ``[0, ncols)`` are swapped to hold the positive columns, so drawing
    uniformly from ``[row_degree, ncols)`` through the remap yields a
    uniform non-neighbor.
    """

    def __init__(self, rng, csr_mat):
        self._rng = rng
        self._csr_mat = csr_mat
        self._nrows, self._ncols = csr_mat.shape
        self._row_degrees = csr_mat.row_degrees
        self._col_degrees = csr_mat.col_degrees
        self._row_remap = [dict() for _ in range(self._nrows)]
        self._col_remap = [dict() for _ in range(self._ncols)]
        row_cnt = np.zeros(self._nrows, np.int64)
        col_cnt = np.zeros(self._ncols, np.int64)
        pairs = csr_mat.node_pair_indices
        for r, c in zip(pairs[0], pairs[1]):
            self._swap(self._row_remap[r], int(row_cnt[r]), int(c))
            row_cnt[r] += 1
            self._swap(self._col_remap[c], int(col_cnt[c]), int(r))
            col_cnt[c] += 1
        assert np.array_equal(row_cnt, self._row_degrees)
        assert np.array_equal(col_cnt, self._col_degrees)
        probs = (self._ncols - self._row_degrees).astype(np.float64)
        self._row_probs = probs / probs.sum()

    @staticmethod
    def _swap(remap, cnt, val):
        cur_val = remap.get(val, val)
        cur_cnt = remap.get(cnt, cnt)
        remap[cnt] = cur_val
        remap[val] = cur_cnt

    def rand_neg_col_with_row(self, row):
        v = self._rng.randint(self._row_degrees[row], self._ncols)
        return self._row_remap[row].get(v, v)

    def rand_neg_row_with_col(self, col):
        v = self._rng.randint(self._col_degrees[col], self._nrows)
        return self._col_remap[col].get(v, v)

    def rand_neg_edges(self, n):
        rows = self._rng.choice(self._nrows, n, replace=True,
                                p=self._row_probs).astype(np.int32)
        cols = np.asarray([self.rand_neg_col_with_row(r) for r in rows],
                          np.int32)
        return rows, cols

    def gen(self, pos_edges, neg_sample_type="all", neg_ratio=1.0):
        """Negative edges for the given positives; ``'same_node'`` keeps one
        endpoint, ``'all'`` samples fresh rows (``iterators.py:62-111``)."""
        pos = np.stack([self._csr_mat.row_id_to_ind(pos_edges[0]),
                        self._csr_mat.col_id_to_ind(pos_edges[1])])
        if neg_sample_type == "same_node":
            rows, cols = [], []
            for r, c in pos.T:
                if self._rng.randint(2):
                    if self._row_degrees[r] < self._ncols:
                        rows.append(r)
                        cols.append(self.rand_neg_col_with_row(r))
                        continue
                elif self._col_degrees[c] < self._nrows:
                    rows.append(self.rand_neg_row_with_col(c))
                    cols.append(c)
                    continue
                rr, cc = self.rand_neg_edges(1)
                rows.append(rr[0]); cols.append(cc[0])
            rows = np.asarray(rows, np.int32)
            cols = np.asarray(cols, np.int32)
        elif neg_sample_type == "all":
            rows, cols = self.rand_neg_edges(
                int(np.round(neg_ratio * pos.shape[1])))
        else:
            raise NotImplementedError(neg_sample_type)
        return np.stack([self._csr_mat.row_ids[rows],
                         self._csr_mat.col_ids[cols]])


class DataIterator:
    """Graph hierarchy + rating / reconstruction samplers."""

    def __init__(self, all_graph, name_user, name_item, is_inductive=False,
                 test_node_pairs=None, valid_node_pairs=None,
                 inductive_key=None, inductive_valid_ids=None,
                 inductive_train_ids=None, embed_P_mask=0.1,
                 embed_p_zero=1.0, embed_p_self=0.0, seed=100):
        self._rng = np.random.RandomState(seed=seed)
        self._all_graph = all_graph
        self._name_user = name_user
        self._name_item = name_item
        self._is_inductive = is_inductive

        self._test_graph = all_graph.remove_edges_by_id(
            name_user, name_item, test_node_pairs)
        if not is_inductive:
            self._val_graph = self._test_graph.remove_edges_by_id(
                name_user, name_item, valid_node_pairs)
            self._train_graph = self._val_graph
        else:
            assert inductive_key is not None
            train_val = np.concatenate(
                [inductive_train_ids, inductive_valid_ids]).astype(np.int32)
            self._val_graph = all_graph.sel_subgraph_by_id(
                inductive_key, train_val).remove_edges_by_id(
                    name_user, name_item, valid_node_pairs)
            self._train_graph = all_graph.sel_subgraph_by_id(
                inductive_key, inductive_train_ids)

        self._test_node_pairs = np.asarray(test_node_pairs, np.int32)
        self._valid_node_pairs = np.asarray(valid_node_pairs, np.int32)
        self._train_node_pairs = \
            self._train_graph[name_user, name_item].node_pair_ids
        self._train_ratings = self._train_graph[name_user, name_item].values
        self._valid_ratings = all_graph.fetch_edges_by_id(
            name_user, name_item, self._valid_node_pairs)
        self._test_ratings = all_graph.fetch_edges_by_id(
            name_user, name_item, self._test_node_pairs)

        def as_dict(v):
            return (dict(v) if isinstance(v, dict)
                    else {k: v for k in all_graph.meta_graph})

        self._embed_P_mask = as_dict(embed_P_mask)
        self._embed_p_zero = as_dict(embed_p_zero)
        self._embed_p_self = as_dict(embed_p_self)
        for key in self._embed_P_mask:
            assert abs(self._embed_p_zero[key] + self._embed_p_self[key]
                       - 1.0) < 1e-9

        self._recon_train_candidates = {}
        self._evaluate_embed_noise_dict = {}
        for key in self._train_graph.meta_graph:
            train_ids = self._train_graph.node_ids[key]
            self._recon_train_candidates[key] = train_ids
            noise = -np.ones(self._all_graph.node_ids[key].shape, np.int32)
            noise[train_ids] = train_ids
            self._evaluate_embed_noise_dict[key] = noise

    # ----------------------------- properties -------------------------------

    @property
    def possible_rating_values(self):
        return self._all_graph[self._name_user, self._name_item].multi_link

    @property
    def name_user(self):
        return self._name_user

    @property
    def name_item(self):
        return self._name_item

    @property
    def evaluate_embed_noise_dict(self):
        return self._evaluate_embed_noise_dict

    @property
    def is_inductive(self):
        return self._is_inductive

    @property
    def all_graph(self):
        return self._all_graph

    @property
    def test_graph(self):
        return self._test_graph

    @property
    def val_graph(self):
        return self._val_graph

    @property
    def train_graph(self):
        return self._train_graph

    @property
    def train_node_pairs(self):
        return self._train_node_pairs

    @property
    def train_ratings(self):
        return self._train_ratings

    @property
    def embed_P_mask(self):
        return self._embed_P_mask

    @property
    def recon_train_candidates(self):
        return self._recon_train_candidates

    @property
    def valid_node_pairs(self):
        return self._valid_node_pairs

    @property
    def valid_ratings(self):
        return self._valid_ratings

    @property
    def test_node_pairs(self):
        return self._test_node_pairs

    @property
    def test_ratings(self):
        return self._test_ratings

    # ------------------------------ samplers --------------------------------

    def rating_sampler(self, batch_size, segment="train", sequential=None):
        """Yield ``(node_pairs (2,B), ratings (B,))`` batches
        (``iterators.py:264-307``)."""
        if segment == "train":
            sequential = False if sequential is None else sequential
            pairs, ratings = self._train_node_pairs, self._train_ratings
        elif segment == "valid":
            sequential = True if sequential is None else sequential
            pairs, ratings = self._valid_node_pairs, self._valid_ratings
        elif segment == "test":
            sequential = True if sequential is None else sequential
            pairs, ratings = self._test_node_pairs, self._test_ratings
        else:
            raise NotImplementedError(segment)
        n = pairs.shape[1]
        batch_size = n if batch_size < 0 else min(batch_size, n)
        if sequential:
            for start in range(0, n, batch_size):
                end = min(start + batch_size, n)
                yield pairs[:, start:end], ratings[start:end]
        else:
            # Epoch-shuffled slices: same without-replacement-within-batch
            # property as the reference's per-batch ``rng.choice`` but
            # amortised O(1) host cost per batch (one permutation per
            # epoch instead of per iteration).
            while True:
                if batch_size == n:
                    yield pairs, ratings
                    continue
                order = self._rng.permutation(n)
                for start in range(0, n - batch_size + 1, batch_size):
                    sel = order[start:start + batch_size]
                    yield pairs[:, sel], ratings[sel]

    def recon_nodes_sampler(self, batch_size, segment="train",
                            sequential=False):
        """Yield ``(embed_noise_dict, batch_recon_ids_dict, all_recon_ids)``.

        Matches ``iterators.py:309-370``: per epoch, sample ``P_mask`` of
        each type's train nodes as reconstruction targets, draw each
        target's mask type from ``(p_zero, p_self)``, and rebuild the
        full-size noise arrays.
        """
        assert segment == "train"
        assert sequential is False
        while True:
            embed_noise_dict, recon_ids_dict = {}, {}
            for key, node_ids in self._recon_train_candidates.items():
                n_recon = int(np.ceil(self._embed_P_mask[key]
                                      * node_ids.size))
                perm = self._rng.permutation(node_ids)
                recon_ids, remain_ids = perm[:n_recon], perm[n_recon:]
                noise = -np.ones(self._all_graph.node_ids[key].shape,
                                 np.int32)
                noise[remain_ids] = remain_ids
                if recon_ids.size > 0:
                    recon_ids_dict[key] = recon_ids
                    mask_type = self._rng.multinomial(
                        1, [self._embed_p_zero[key],
                            self._embed_p_self[key]],
                        size=recon_ids.size)
                    noise[recon_ids] = (
                        mask_type * np.stack(
                            [-np.ones(recon_ids.shape), recon_ids], axis=1)
                    ).sum(axis=1).astype(np.int32)
                embed_noise_dict[key] = noise

            curr = {key: 0 for key in recon_ids_dict}
            while True:
                batch_ids = {}
                for key, ids in recon_ids_dict.items():
                    if curr[key] >= ids.size:
                        # exhausted: slicing past the end would yield a
                        # spurious empty batch
                        continue
                    batch_ids[key] = ids[curr[key]:curr[key] + batch_size]
                    curr[key] += batch_size
                if not batch_ids:
                    break
                if len(batch_ids) != len(recon_ids_dict):
                    break
                yield embed_noise_dict, batch_ids, recon_ids_dict

    def __repr__(self):
        return ("DataIterator(\nAll=" + repr(self._all_graph)
                + "\nTrain=" + repr(self._train_graph) + "\n)")

"""Host graph kernels: native C++ fast path with NumPy fallback.

The native extension ``stargcn_tpu.native._graph_kernels`` (built from
``stargcn_tpu/native/graph_kernels.cpp``) provides the TPU-era equivalent
of the reference ``GraphSampler`` C++/OpenMP module
(``GraphSampler/py_ext.cpp:612-627``, 13 exported functions).  Every
function here has an identical-semantics NumPy implementation used when
the extension is not compiled, so the pure-Python package is always
functional and the two are cross-checked in tests.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised when the extension is built
    from stargcn_tpu.native import _graph_kernels as _native
except ImportError:  # pragma: no cover
    _native = None

_seed_state = {"seed": 0}
# Persistent fallback stream: ADVANCES across calls (recreated only by
# set_seed), matching the native engines' statefulness.  A fresh
# RandomState per call would silently return identical "random" draws
# every step.
_fallback_rng = np.random.RandomState(0)


def has_native() -> bool:
    return _native is not None


def native_module():
    """The raw C extension module (or None) — for callers needing
    exports without a NumPy-fallback wrapper here."""
    return _native


def set_seed(seed: int) -> None:
    """Seed the native sampler engines (reference ``py_ext.cpp`` ``set_seed``
    → 128 seeded mt19937 engines, ``graph_sampler.h:176-202``) and the
    NumPy fallback stream."""
    global _fallback_rng
    _seed_state["seed"] = int(seed)
    _fallback_rng = np.random.RandomState(int(seed) & 0xFFFFFFFF)
    if _native is not None:
        _native.set_seed(int(seed))


def set_omp_threads(n: int) -> int:
    """Cap the OpenMP team size for native kernels called from the
    CALLING thread (nthreads-var is a per-thread ICV).  Used by the
    sampled-mode prefetch producer so its planner teams leave cores for
    the TPU-dispatch threads (BASELINE.md host-threading finding).
    Returns the resulting max team size (1 without the native ext)."""
    if _native is not None and hasattr(_native, "set_omp_threads"):
        return int(_native.set_omp_threads(int(n)))
    return 1


def _rng(seed=None):
    """Fallback RNG: the persistent advancing stream, or a one-shot
    deterministic stream when an explicit ``seed`` is given."""
    if seed is None:
        return _fallback_rng
    return np.random.RandomState(int(seed) & 0xFFFFFFFF)


def unique_inverse(arr: np.ndarray):
    """Order-of-first-occurrence unique + inverse indices.

    Reference: C++ ``unique_inverse`` (``graph_sampler.h:396-565``).  Note
    ``np.unique`` sorts — the reference does NOT; first-occurrence order is
    part of the contract that downstream id-merging relies on.
    """
    arr = np.ascontiguousarray(arr, dtype=np.int32)
    if _native is not None:
        return _native.unique_inverse(arr)
    uniq_sorted, first_idx, inv_sorted = np.unique(
        arr, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    uniq = uniq_sorted[order]
    remap = np.empty_like(order)
    remap[order] = np.arange(order.size)
    return uniq.astype(np.int32), remap[inv_sorted].astype(np.int32).ravel()


def unique_cnt(arr: np.ndarray):
    """Unique (first-occurrence order) + counts (reference ``unique_cnt``)."""
    arr = np.ascontiguousarray(arr, dtype=np.int32)
    if _native is not None:
        return _native.unique_cnt(arr)
    uniq, inv = unique_inverse(arr)
    cnt = np.zeros(uniq.size, dtype=np.int32)
    np.add.at(cnt, inv, 1)
    return uniq, cnt


def take_1d(data: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Parallel 1-D gather (reference ``take_1d_omp``)."""
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    if _native is not None and data.dtype in (np.int32, np.float32):
        return _native.take_1d(np.ascontiguousarray(data), indices)
    return np.take(data, indices)


def row_indices_from_indptr(ind_ptr: np.ndarray, nnz: int) -> np.ndarray:
    """CSR -> COO row expansion (reference ``gen_row_indices_by_indptr``,
    ``graph_sampler.cpp:378-391``)."""
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    if _native is not None:
        return _native.gen_row_indices_by_indptr(ind_ptr, int(nnz))
    return np.repeat(
        np.arange(ind_ptr.size - 1, dtype=np.int32),
        np.diff(ind_ptr)).astype(np.int32)


def seg_sum(data: np.ndarray, indptr: np.ndarray) -> np.ndarray:
    """CPU segment sum (reference ``seg_sum`` template,
    ``graph_sampler.h:339-394``)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    if _native is not None:
        return _native.seg_sum(data, indptr)
    return _npy_seg_sum(data, indptr)


def _npy_seg_sum(data, indptr):
    seg_ids = np.repeat(np.arange(indptr.size - 1), np.diff(indptr))
    out = np.zeros(indptr.size - 1, dtype=np.float32)
    np.add.at(out, seg_ids, data)
    return out


def seg_add(lhs: np.ndarray, rhs: np.ndarray, indptr: np.ndarray):
    """``out[j] = lhs[j] + rhs[seg(j)]`` (reference ``seg_add``)."""
    lhs = np.ascontiguousarray(lhs, dtype=np.float32)
    rhs = np.ascontiguousarray(rhs, dtype=np.float32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    if _native is not None:
        return _native.seg_add(lhs, rhs, indptr)
    return lhs + np.repeat(rhs, np.diff(indptr))


def seg_mul(lhs: np.ndarray, rhs: np.ndarray, indptr: np.ndarray):
    """``out[j] = lhs[j] * rhs[seg(j)]`` (reference ``seg_mul``)."""
    lhs = np.ascontiguousarray(lhs, dtype=np.float32)
    rhs = np.ascontiguousarray(rhs, dtype=np.float32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    if _native is not None:
        return _native.seg_mul(lhs, rhs, indptr)
    return lhs * np.repeat(rhs, np.diff(indptr))


def get_support(row_degrees, col_degrees, ind_ptr, end_points, symm=True):
    """Per-edge support (reference C++ ``get_support``,
    ``graph_sampler.cpp:393-420``)."""
    row_degrees = np.ascontiguousarray(row_degrees, dtype=np.int32)
    col_degrees = np.ascontiguousarray(col_degrees, dtype=np.int32)
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    end_points = np.ascontiguousarray(end_points, dtype=np.int32)
    if _native is not None:
        return _native.get_support(row_degrees, col_degrees, ind_ptr,
                                   end_points, int(symm))
    nnz = end_points.size
    row_per_edge = np.repeat(np.arange(ind_ptr.size - 1), np.diff(ind_ptr))
    r_deg = row_degrees[row_per_edge].astype(np.float64)
    out = np.zeros(nnz, dtype=np.float32)
    if symm:
        c_deg = col_degrees[end_points].astype(np.float64)
        ok = (r_deg != 0) & (c_deg != 0)
        out[ok] = np.sqrt(1.0 / r_deg[ok] / c_deg[ok]).astype(np.float32)
    else:
        ok = r_deg != 0
        out[ok] = (1.0 / r_deg[ok]).astype(np.float32)
    return out


def csr_submat(ind_ptr, end_points, row_indices, col_indices, num_cols):
    """Row/col submatrix extraction.

    Reference: ``slice_csr_mat`` (``graph_sampler.cpp:31-152``) — keeps
    edges whose column is in ``col_indices``, remapping columns to the new
    index space.  Returns ``(new_ind_ptr, new_end_points, edge_idx)`` where
    ``edge_idx`` indexes the original edge arrays (for value slicing).
    """
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    end_points = np.ascontiguousarray(end_points, dtype=np.int32)
    row_indices = np.ascontiguousarray(row_indices, dtype=np.int32)
    col_indices = np.ascontiguousarray(col_indices, dtype=np.int32)
    if _native is not None:
        return _native.csr_submat(ind_ptr, end_points, row_indices,
                                  col_indices, int(num_cols))
    col_map = np.full(num_cols, -1, dtype=np.int32)
    col_map[col_indices] = np.arange(col_indices.size, dtype=np.int32)
    new_ind_ptr = np.zeros(row_indices.size + 1, dtype=np.int32)
    new_end_points, edge_idx = [], []
    for i, r in enumerate(row_indices):
        sl = slice(ind_ptr[r], ind_ptr[r + 1])
        cols = col_map[end_points[sl]]
        keep = cols >= 0
        new_end_points.append(cols[keep])
        edge_idx.append(np.arange(sl.start, sl.stop)[keep])
        new_ind_ptr[i + 1] = new_ind_ptr[i] + int(keep.sum())
    return (new_ind_ptr,
            (np.concatenate(new_end_points) if new_end_points
             else np.array([], np.int32)).astype(np.int32),
            (np.concatenate(edge_idx) if edge_idx
             else np.array([], np.int64)).astype(np.int64))


def multi_link_split(edge_values, ind_ptr, multi_link):
    """Partition edges into per-rating-value index lists + per-value indptr.

    Reference: ``multi_link_split_impl`` (``graph_sampler.cpp:277-376``).
    Returns ``(split_indices, ind_ptr_l)``: for each rating value ``v`` in
    ``multi_link`` (sorted), the edge positions with that value (in CSR
    order) and the per-row indptr of the resulting sub-CSR.
    """
    edge_values = np.ascontiguousarray(edge_values, dtype=np.float32)
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    multi_link = np.ascontiguousarray(multi_link, dtype=np.float32)
    if _native is not None:
        return _native.multi_link_split(edge_values, ind_ptr, multi_link)
    num_rows = ind_ptr.size - 1
    row_per_edge = np.repeat(np.arange(num_rows), np.diff(ind_ptr))
    split_indices, ind_ptr_l = [], []
    for v in multi_link:
        sel = np.nonzero(edge_values == v)[0].astype(np.int32)
        split_indices.append(sel)
        new_ptr = np.zeros(num_rows + 1, dtype=np.int32)
        np.add.at(new_ptr[1:], row_per_edge[sel], 1)
        ind_ptr_l.append(np.cumsum(new_ptr).astype(np.int32))
    return split_indices, ind_ptr_l


def random_sample_fix_neighbor(ind_ptr, sel_indices, num_neighbors,
                               seed=None):
    """Fixed-fanout sampling without replacement per selected row.

    Reference: ``GraphSampler::random_sample_fix_neighbor``
    (``graph_sampler.cpp:742-780``).  ``num_neighbors < 0`` keeps all
    neighbors (in order).  Returns ``(sampled_edge_indices, new_ind_ptr)``.
    """
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    sel_indices = np.ascontiguousarray(sel_indices, dtype=np.int32)
    if _native is not None:
        if seed is not None:  # reseeds the shared native engines
            _native.set_seed(int(seed))
        return _native.random_sample_fix_neighbor(ind_ptr, sel_indices,
                                                  int(num_neighbors))
    rng = _rng(seed)
    degs = ind_ptr[sel_indices + 1] - ind_ptr[sel_indices]
    if num_neighbors < 0:
        take = degs
    else:
        take = np.minimum(degs, num_neighbors)
    new_ind_ptr = np.concatenate([[0], np.cumsum(take)]).astype(np.int32)
    out = np.empty(int(new_ind_ptr[-1]), dtype=np.int64)
    for i, r in enumerate(sel_indices):
        beg, end = ind_ptr[r], ind_ptr[r + 1]
        n = take[i]
        if n == end - beg:
            out[new_ind_ptr[i]:new_ind_ptr[i + 1]] = np.arange(beg, end)
        else:
            out[new_ind_ptr[i]:new_ind_ptr[i + 1]] = rng.choice(
                np.arange(beg, end), size=n, replace=False)
    return out, new_ind_ptr


def random_walk(end_points, ind_ptr, initial_node=-1, walk_length=100,
                return_prob=0.15, max_node_num=10**9, max_edge_num=10**12):
    """KDD'06-style random-walk subgraph sampling -> (src, dst) edge arrays.

    Reference: ``GraphSampler::random_walk`` (``graph_sampler.cpp:476-506``).
    """
    end_points = np.ascontiguousarray(end_points, dtype=np.int32)
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    if _native is not None:
        return _native.random_walk(end_points, ind_ptr, int(initial_node),
                                   int(walk_length), float(return_prob),
                                   int(max_node_num), int(max_edge_num))
    rng = _rng()
    node_num = ind_ptr.size - 1
    if initial_node < 0:
        initial_node = rng.randint(node_num)
    cur, edges, nodes = initial_node, set(), {initial_node}
    src, dst = [], []
    for _ in range(walk_length):
        if rng.rand() < return_prob:
            cur = initial_node
            continue
        beg, end = ind_ptr[cur], ind_ptr[cur + 1]
        if end <= beg:
            break
        nxt = int(end_points[rng.randint(beg, end)])
        if (cur, nxt) not in edges:
            if len(edges) >= max_edge_num:
                break
            nodes.add(nxt)
            if len(nodes) > max_node_num:
                break
            edges.add((cur, nxt))
            src.append(cur)
            dst.append(nxt)
        cur = nxt
    return (np.asarray(src, np.int32), np.asarray(dst, np.int32))


def get_random_walk_nodes(end_points, ind_ptr, initial_node,
                          max_node_num, walk_length):
    """Visited nodes along a plain random walk (reference
    ``get_random_walk_nodes``, ``graph_sampler.cpp:669-700``)."""
    end_points = np.ascontiguousarray(end_points, dtype=np.int32)
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    if _native is not None:
        return _native.get_random_walk_nodes(
            end_points, ind_ptr, int(initial_node), int(max_node_num),
            int(walk_length))
    rng = _rng()
    seen = [int(initial_node)]
    seen_set = {int(initial_node)}
    cur = int(initial_node)
    for _ in range(walk_length):
        beg, end = ind_ptr[cur], ind_ptr[cur + 1]
        if end <= beg:
            break
        cur = int(end_points[rng.randint(beg, end)])
        if cur not in seen_set:
            seen_set.add(cur)
            seen.append(cur)
        if len(seen_set) >= max_node_num:
            break
    return np.asarray(seen, np.int32)


def uniform_neg_sampling(end_points, ind_ptr, target_indices, node_num,
                         neg_sample_scale=1.0, replace=False):
    """Positive + uniform-negative edges per target node (reference
    ``uniform_neg_sampling``, ``graph_sampler.cpp:599-668``).  Returns
    ``(end_points, ind_ptr, edge_label (+1/-1), edge_count)``."""
    end_points = np.ascontiguousarray(end_points, dtype=np.int32)
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    target_indices = np.ascontiguousarray(target_indices, dtype=np.int32)
    if _native is not None:
        return _native.uniform_neg_sampling(
            end_points, ind_ptr, target_indices, int(node_num),
            float(neg_sample_scale), int(replace))
    rng = _rng()
    out_ep, out_label, out_cnt = [], [], []
    out_ptr = [0]
    for ind in target_indices:
        beg, end = ind_ptr[ind], ind_ptr[ind + 1]
        pos = end - beg
        if pos > 0:
            pos_set = set(end_points[beg:end].tolist())
            want = min(int(np.ceil(pos * neg_sample_scale)), int(node_num))
            out_ep.extend(end_points[beg:end].tolist())
            out_label.extend([1] * pos)
            out_cnt.extend([1] * pos)
            candidates = np.setdiff1d(np.arange(node_num),
                                      np.asarray(sorted(pos_set)))
            if candidates.size:
                k = min(want, candidates.size) if not replace else want
                negs = rng.choice(candidates, size=k, replace=replace)
                if replace:
                    vals, cnts = np.unique(negs, return_counts=True)
                    out_ep.extend(vals.tolist())
                    out_cnt.extend(cnts.tolist())
                    out_label.extend([-1] * vals.size)
                else:
                    out_ep.extend(negs.tolist())
                    out_cnt.extend([1] * k)
                    out_label.extend([-1] * k)
        out_ptr.append(len(out_ep))
    return (np.asarray(out_ep, np.int32), np.asarray(out_ptr, np.int32),
            np.asarray(out_label, np.int32), np.asarray(out_cnt, np.int32))


def random_sel_neighbor_and_merge(end_points, ind_ptr, node_ids,
                                  sel_indices, num_neighbors):
    """Fanout-sample neighbors and merge (selected + neighbors) into a
    first-occurrence-unique frontier (reference
    ``random_sel_neighbor_and_merge``, ``graph_sampler.cpp:781-875``).

    Returns ``(dst_end_points [positions in merged], dst_ind_ptr,
    merged_node_ids, indices_in_merged)``.
    """
    end_points = np.ascontiguousarray(end_points, dtype=np.int32)
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    node_ids = np.ascontiguousarray(node_ids, dtype=np.int32)
    sel_indices = np.ascontiguousarray(sel_indices, dtype=np.int32)
    if _native is not None:
        return _native.random_sel_neighbor_and_merge(
            end_points, ind_ptr, node_ids, sel_indices, int(num_neighbors))
    rng = _rng()
    merged, merged_map = [], {}

    def intern(nid):
        nid = int(nid)
        if nid not in merged_map:
            merged_map[nid] = len(merged)
            merged.append(nid)
        return merged_map[nid]

    dst_ep, dst_ptr, sel_in_merged = [], [0], []
    for ind in sel_indices:
        sel_in_merged.append(intern(node_ids[ind]))
        beg, end = ind_ptr[ind], ind_ptr[ind + 1]
        deg = end - beg
        take = deg if num_neighbors < 0 else min(deg, num_neighbors)
        picks = (np.arange(beg, end) if take == deg else
                 rng.choice(np.arange(beg, end), take, replace=False))
        for j in picks:
            dst_ep.append(intern(node_ids[end_points[j]]))
        dst_ptr.append(len(dst_ep))
    return (np.asarray(dst_ep, np.int32), np.asarray(dst_ptr, np.int32),
            np.asarray(merged, np.int32),
            np.asarray(sel_in_merged, np.int32))


def remove_edges_by_indices(ind_ptr, end_points, remove_edge_idx):
    """New CSR without the edges at the given positions (reference
    ``remove_edges``/``remove_edges_omp``, ``graph_sampler.cpp:154-275``).
    Returns ``(new_ind_ptr, keep_mask)``."""
    ind_ptr = np.ascontiguousarray(ind_ptr, dtype=np.int32)
    nnz = int(ind_ptr[-1])
    keep = np.ones(nnz, dtype=bool)
    keep[np.asarray(remove_edge_idx, dtype=np.int64)] = False
    row_per_edge = np.repeat(np.arange(ind_ptr.size - 1), np.diff(ind_ptr))
    new_ptr = np.zeros(ind_ptr.size, dtype=np.int32)
    np.add.at(new_ptr[1:], row_per_edge[keep], 1)
    return np.cumsum(new_ptr).astype(np.int32), keep


def sample_block_ell(ind_ptr, end_points, col_ids, rating_idx,
                     inv_row, inv_col, sel_rows, frontier_other,
                     exclude_keys, id_cap, fanout, n_dst, row_is_user,
                     key_mult):
    """Fused sampled-plan block builder (native-only fast path for
    ``BlockSampler.sample``; ``graph_kernels.cpp py_sample_block_ell``).

    One pass per (layer, node-type): fixed-fanout edge sampling, support
    = ``inv_row[row] * inv_col[col]`` (removal-adjusted degrees fold into
    the inv vectors), batch-edge exclusion against sorted ``exclude_keys``
    (REMOVE_RATING), first-occurrence interning of neighbor ids into the
    next frontier (seeded with ``frontier_other``), and the ELL scatter.
    The reference keeps this planning in C++ as well
    (``random_sel_neighbor_and_merge``, ``graph_sampler.cpp:781-875``).

    Returns ``(nbr_pos, weight, rating, merged_ids)`` with the first
    three shaped ``(n_dst, fanout)``.  Raises ``RuntimeError`` when the
    native extension is unavailable — callers fall back to the pure
    NumPy pipeline in ``BlockSampler.sample``.
    """
    if _native is None:
        raise RuntimeError("sample_block_ell needs the native extension; "
                           "build with `python -m stargcn_tpu.native.build`")
    nbr_pos, weight, rating, merged = _native.sample_block_ell(
        np.ascontiguousarray(ind_ptr, np.int32),
        np.ascontiguousarray(end_points, np.int32),
        np.ascontiguousarray(col_ids, np.int32),
        np.ascontiguousarray(rating_idx, np.int32),
        np.ascontiguousarray(inv_row, np.float32),
        np.ascontiguousarray(inv_col, np.float32),
        np.ascontiguousarray(sel_rows, np.int32),
        np.ascontiguousarray(frontier_other, np.int32),
        np.ascontiguousarray(exclude_keys, np.int64),
        int(id_cap), int(fanout), int(n_dst), int(row_is_user),
        int(key_mult))
    fan = int(fanout)
    return (nbr_pos.reshape(-1, fan), weight.reshape(-1, fan),
            rating.reshape(-1, fan), merged)

"""Tests for the host graph layer (CSRMat / HeterGraph / native kernels)."""

import numpy as np
import pytest
import scipy.sparse as sp

from stargcn_tpu.graph import CSRMat, HeterGraph, merge_node_ids_dict, merge_nodes
from stargcn_tpu.graph import kernels as K


def random_csr(rng, rows=20, cols=15, density=0.3, ratings=(1, 2, 3, 4, 5)):
    mat = sp.random(rows, cols, density=density, random_state=rng,
                    data_rvs=lambda n: rng.choice(ratings, n)).tocsr()
    mat.data = mat.data.astype(np.float32)
    return CSRMat.from_spy(mat, multi_link=np.asarray(ratings, np.float32))


def test_unique_inverse_first_occurrence_order(rng):
    arr = np.array([7, 2, 7, 9, 2, 7, 0], np.int32)
    uniq, inv = K.unique_inverse(arr)
    np.testing.assert_array_equal(uniq, [7, 2, 9, 0])
    np.testing.assert_array_equal(uniq[inv], arr)


@pytest.mark.skipif(not K.has_native(), reason="native ext not built")
def test_native_matches_numpy_fallback(rng):
    """Native C++ kernels agree with the NumPy fallbacks."""
    import stargcn_tpu.graph.kernels as km

    arr = rng.randint(0, 50, size=200).astype(np.int32)
    nat_u, nat_i = km._native.unique_inverse(arr)
    # numpy fallback path
    saved = km._native
    try:
        km._native = None
        py_u, py_i = km.unique_inverse(arr)
    finally:
        km._native = saved
    np.testing.assert_array_equal(nat_u, py_u)
    np.testing.assert_array_equal(nat_i, py_i)

    indptr = np.concatenate([[0], np.cumsum(rng.randint(0, 5, 30))]).astype(
        np.int32)
    nnz = int(indptr[-1])
    data = rng.normal(size=nnz).astype(np.float32)
    seg_vals = rng.normal(size=30).astype(np.float32)
    end_points = rng.randint(0, 12, nnz).astype(np.int32)
    row_deg = (indptr[1:] - indptr[:-1]).astype(np.int32)
    col_deg = np.bincount(end_points, minlength=12).astype(np.int32)

    for fn, args in [
        ("seg_sum", (data, indptr)),
        ("seg_add", (data, seg_vals, indptr)),
        ("seg_mul", (data, seg_vals, indptr)),
        ("gen_row_indices_by_indptr", (indptr, nnz)),
        ("get_support", (row_deg, col_deg, indptr, end_points, True)),
    ]:
        nat = getattr(km._native, fn)(*[
            a if not isinstance(a, bool) else int(a) for a in args])
        try:
            km._native = None
            ref = getattr(km, fn if fn != "gen_row_indices_by_indptr"
                          else "row_indices_from_indptr")(*args)
        finally:
            km._native = saved
        np.testing.assert_allclose(nat, ref, rtol=1e-6, atol=1e-6)


def test_csr_support_formula(rng):
    csr = random_csr(rng)
    sup = csr.get_support(symm=True)
    rd, cd = csr.row_degrees, csr.col_degrees
    for i in range(csr.shape[0]):
        for j in range(csr.ind_ptr[i], csr.ind_ptr[i + 1]):
            want = 1.0 / np.sqrt(rd[i] * cd[csr.end_points[j]])
            np.testing.assert_allclose(sup[j], want, rtol=1e-5)
    sup_a = csr.get_support(symm=False)
    for i in range(csr.shape[0]):
        for j in range(csr.ind_ptr[i], csr.ind_ptr[i + 1]):
            np.testing.assert_allclose(sup_a[j], 1.0 / rd[i], rtol=1e-5)


def test_csr_transpose_roundtrip(rng):
    csr = random_csr(rng)
    t = csr.T
    assert t.shape == (csr.shape[1], csr.shape[0])
    a = {tuple(p): v for p, v in zip(csr.node_pair_ids.T, csr.values)}
    b = {tuple(p[::-1]): v for p, v in zip(t.node_pair_ids.T, t.values)}
    assert a == b


def test_csr_submat_by_id(rng):
    csr = random_csr(rng)
    row_ids = np.array([3, 5, 11], np.int32)
    col_ids = np.array([0, 2, 4, 9, 14], np.int32)
    sub = csr.submat_by_id(row_ids=row_ids, col_ids=col_ids)
    np.testing.assert_array_equal(sub.row_ids, row_ids)
    np.testing.assert_array_equal(sub.col_ids, col_ids)
    # every kept edge exists in the parent with the same value
    for (r, c), v in zip(sub.node_pair_ids.T, sub.values):
        assert csr.fetch_edges_by_id(np.array([[r], [c]]))[0] == v
    # count: edges of parent within the id sets
    cnt = sum(1 for (r, c) in csr.node_pair_ids.T
              if r in set(row_ids.tolist()) and c in set(col_ids.tolist()))
    assert sub.nnz == cnt


def test_csr_remove_edges(rng):
    csr = random_csr(rng)
    pairs = csr.node_pair_ids[:, ::3]
    out = csr.remove_edges_by_id(pairs)
    assert out.nnz == csr.nnz - pairs.shape[1]
    vals = out.fetch_edges_by_id(pairs)
    np.testing.assert_array_equal(vals, np.zeros(pairs.shape[1]))
    out.check_consistency()


def test_issubmat_and_empty_as_zero(rng):
    from stargcn_tpu.graph.csr import NodeIDRMapFast, empty_as_zero

    csr = random_csr(rng)
    sub = csr.submat_by_id(row_ids=np.array([3, 5], np.int32))
    assert sub.issubmat(csr)
    assert not csr.issubmat(sub) or csr.nnz == sub.nnz
    # tampered value breaks the relation
    sub2 = CSRMat(sub.ind_ptr, sub.end_points, sub.values + 1.0,
                  sub.row_ids, sub.col_ids, multi_link=sub.multi_link)
    assert not sub2.issubmat(csr)
    out = empty_as_zero([np.array([]), np.array([1, 2])], np.int32)
    np.testing.assert_array_equal(out[0], [0])
    np.testing.assert_array_equal(out[1], [1, 2])
    rmap = NodeIDRMapFast(np.array([5, 9], np.int32))
    assert rmap[9] == 1


def test_csr_fetch_edges(rng):
    csr = random_csr(rng)
    pairs = csr.node_pair_ids[:, :5]
    np.testing.assert_array_equal(csr.fetch_edges_by_id(pairs),
                                  csr.values[:5])
    missing = np.array([[csr.row_ids[0]], [csr.col_ids[0]]])
    if csr.fetch_edges_by_id(missing)[0] != 0:
        # (0,0) happens to be an edge; pick a pair guaranteed absent
        pass


def test_sample_neighbors_full_and_split(rng):
    csr = random_csr(rng)
    eps, vals, ptr, sup = csr.sample_neighbors(
        use_multi_link=True, num_neighbors=-1)
    R = len(csr.multi_link)
    assert len(eps) == R and len(ptr) == R
    assert sum(len(e) for e in eps) == csr.nnz
    # per-rating values are constant
    for r in range(R):
        assert np.all(vals[r] == csr.multi_link[r])
    # support was computed on the FULL matrix (total degrees) before split
    full_sup = csr.get_support(True)
    total = np.concatenate(sup) if R else np.array([])
    assert np.isin(np.round(total, 6), np.round(full_sup, 6)).all()


def test_sample_neighbors_fanout(rng):
    csr = random_csr(rng, rows=30, cols=30, density=0.5)
    K.set_seed(3)
    eps, vals, ptr, sup = csr.sample_neighbors(
        use_multi_link=False, num_neighbors=3)
    deg = np.diff(ptr)
    assert np.all(deg <= 3)
    np.testing.assert_array_equal(deg, np.minimum(csr.row_degrees, 3))


def test_merge_nodes(rng):
    a = np.array([4, 1, 4], np.int32)
    b = np.array([9, 1], np.int32)
    uniq, (ia, ib) = merge_nodes([a, b])
    np.testing.assert_array_equal(uniq, [4, 1, 9])
    np.testing.assert_array_equal(uniq[ia], a)
    np.testing.assert_array_equal(uniq[ib], b)
    uniq_d, invs = merge_node_ids_dict([{"u": a}, {"u": b, "v": a}])
    np.testing.assert_array_equal(uniq_d["u"], [4, 1, 9])
    np.testing.assert_array_equal(uniq_d["u"][invs[1]["u"]], b)


def test_heter_graph_transpose_and_removal(rng):
    csr = random_csr(rng)
    g = HeterGraph(
        features={"user": rng.normal(size=(20, 3)),
                  "movie": rng.normal(size=(15, 4))},
        csr_mat_dict={("user", "movie"): csr})
    assert g.meta_graph == {"user": ["movie"], "movie": ["user"]}
    g.check_consistency()
    g.check_continous_node_ids()
    assert g["movie", "user"].shape == (15, 20)
    pairs = csr.node_pair_ids[:, :4]
    g2 = g.remove_edges_by_id("user", "movie", pairs)
    assert g2["user", "movie"].nnz == csr.nnz - 4
    assert g2["movie", "user"].nnz == csr.nnz - 4
    assert g2.features is not g.features or True  # features shared by value
    g2.check_consistency()


def test_heter_graph_subgraph(rng):
    csr = random_csr(rng)
    g = HeterGraph(
        features={"user": rng.normal(size=(20, 3)),
                  "movie": rng.normal(size=(15, 4))},
        csr_mat_dict={("user", "movie"): csr})
    keep = np.array([0, 3, 7, 8], np.int32)
    sub = g.sel_subgraph_by_id("movie", keep)
    np.testing.assert_array_equal(sub.node_ids["movie"], keep)
    assert np.all(np.isin(sub["user", "movie"].node_pair_ids[1], keep))
    sub.check_consistency()


def test_heter_graph_save_load(rng, tmp_path):
    csr = random_csr(rng)
    g = HeterGraph(
        features={"user": rng.normal(size=(20, 3)).astype(np.float32),
                  "movie": rng.normal(size=(15, 4)).astype(np.float32)},
        csr_mat_dict={("user", "movie"): csr})
    g.save(str(tmp_path / "g"))
    g2 = HeterGraph.load(str(tmp_path / "g"))
    np.testing.assert_allclose(g2.features["user"], g.features["user"])
    assert g2["user", "movie"].nnz == csr.nnz
    np.testing.assert_array_equal(g2["user", "movie"].values, csr.values)


def test_device_graph_pair_lookup_gating(rng):
    """Beyond int32 pair-key space the device lookup is skipped (not an
    assert): sampled mode still constructs, in-jit removal raises."""
    import jax.numpy as jnp

    from stargcn_tpu.graph.device import BipartiteGraphData

    n = 64
    big = 70_000  # 70k * 70k > 2**31
    gd = BipartiteGraphData.from_arrays(
        rng.randint(0, big, n), rng.randint(0, big, n),
        rng.randint(0, 5, n), big, big, 5, pad_multiple=64)
    assert not gd.has_pair_lookup
    with pytest.raises(ValueError, match="sampled mode"):
        gd.edge_mask_from_pairs(jnp.zeros(4, jnp.int32),
                                jnp.zeros(4, jnp.int32),
                                jnp.ones(4), gd.edge_pad_mask)

    small = BipartiteGraphData.from_arrays(
        rng.randint(0, 100, n), rng.randint(0, 100, n),
        rng.randint(0, 5, n), 100, 100, 5, pad_multiple=64)
    assert small.has_pair_lookup


def test_csr_convenience_surface(rng, tmp_path):
    """to_spy / size / save_edges_txt / sample_submat_by_id — the small
    reference conveniences (graph.py:318-358, :570-597)."""
    csr = random_csr(rng)
    assert csr.size == csr.nnz
    spy = csr.to_spy()
    assert spy.shape == csr.shape
    np.testing.assert_array_equal(spy.indptr, csr.ind_ptr)
    np.testing.assert_array_equal(spy.indices, csr.end_points)
    np.testing.assert_allclose(spy.data, csr.values)
    # round-trips through the constructor it mirrors
    back = CSRMat.from_spy(spy, multi_link=csr.multi_link)
    np.testing.assert_array_equal(back.end_points, csr.end_points)

    fname = str(tmp_path / "edges.txt")
    csr.save_edges_txt(fname)
    lines = open(fname).read().splitlines()
    assert len(lines) == csr.nnz
    r0, c0, v0 = lines[0].split("\t")
    ids = csr.node_pair_ids
    assert int(r0) == ids[0][0] and int(c0) == ids[1][0]
    assert float(v0) == csr.values[0]

    sub_id = csr.sample_submat_by_id(csr.row_ids[[2, 5, 9]], ncols=3,
                                     seed=7)
    sub_ind = csr.sample_submat(np.array([2, 5, 9], np.int32), ncols=3,
                                seed=7)
    np.testing.assert_array_equal(sub_id.row_ids, sub_ind.row_ids)
    np.testing.assert_array_equal(sub_id.end_points, sub_ind.end_points)


def test_heter_graph_feature_conveniences(rng):
    """node_names / node_id_rmaps / node_id_to_ind / features_by_id /
    device_features (reference graph.py:865-918, gen_nd_features
    :1032-1043)."""
    csr = random_csr(rng)
    feats = {"user": rng.normal(size=(20, 3)).astype(np.float32),
             "movie": rng.normal(size=(15, 4)).astype(np.float32)}
    g = HeterGraph(features=feats, csr_mat_dict={("user", "movie"): csr})
    assert set(g.node_names) == {"user", "movie"}
    ids = np.array([4, 0, 11], np.int32)
    np.testing.assert_array_equal(g.node_id_to_ind("user", ids), ids)
    np.testing.assert_allclose(g.features_by_id("movie", ids),
                               feats["movie"][ids])
    dev = g.device_features()
    assert set(dev) == {"user", "movie"}
    np.testing.assert_allclose(np.asarray(dev["user"]), feats["user"],
                               rtol=1e-6)
    # non-identity id space: rmaps must invert correctly
    sub = g.sel_subgraph_by_id("movie", np.array([3, 7, 9], np.int32))
    np.testing.assert_array_equal(
        sub.node_id_to_ind("movie", np.array([7, 3], np.int32)), [1, 0])
    np.testing.assert_allclose(
        sub.features_by_id("movie", np.array([9], np.int32)),
        np.asarray(sub.features["movie"])[[2]])


def test_to_spy_does_not_alias(rng):
    """ADVICE r3: mutating the exported scipy matrix must not corrupt
    the CSRMat (scipy.sparse does not copy same-dtype input arrays)."""
    from stargcn_tpu.data.synthetic import synthetic_graph
    g = synthetic_graph(num_users=12, num_items=9, num_edges=40, seed=3)
    m = g["user", "movie"]
    before = m.values.copy()
    sp = m.to_spy()
    sp.data[:] = -999.0
    np.testing.assert_array_equal(m.values, before)

"""Tests for the random-walk / negative-sampling / sample-and-merge host
kernels (native + NumPy fallback)."""

import numpy as np
import pytest

from stargcn_tpu.graph import kernels as K


@pytest.fixture
def chain_graph():
    # 0-1-2-3-4 path graph (undirected CSR)
    ep = np.array([1, 0, 2, 1, 3, 2, 4, 3], np.int32)
    ptr = np.array([0, 1, 3, 5, 7, 8], np.int32)
    return ep, ptr


def test_random_walk_edges_valid(chain_graph):
    ep, ptr = chain_graph
    K.set_seed(5)
    src, dst = K.random_walk(ep, ptr, initial_node=2, walk_length=200,
                             return_prob=0.2, max_node_num=5,
                             max_edge_num=100)
    assert src.size == dst.size > 0
    edge_set = {(int(ptr[s]), int(ptr[s + 1])) for s in src}
    for s, d in zip(src, dst):
        assert d in ep[ptr[s]:ptr[s + 1]], (s, d)
    # no duplicate edges
    pairs = list(zip(src.tolist(), dst.tolist()))
    assert len(pairs) == len(set(pairs))


def test_random_walk_node_cap(chain_graph):
    ep, ptr = chain_graph
    K.set_seed(5)
    src, dst = K.random_walk(ep, ptr, initial_node=0, walk_length=500,
                             return_prob=0.0, max_node_num=3,
                             max_edge_num=1000)
    assert len(set(src.tolist()) | set(dst.tolist())) <= 3


def test_get_random_walk_nodes(chain_graph):
    ep, ptr = chain_graph
    K.set_seed(7)
    nodes = K.get_random_walk_nodes(ep, ptr, initial_node=2,
                                    max_node_num=3, walk_length=100)
    assert nodes[0] == 2
    assert np.unique(nodes).size == nodes.size
    assert nodes.size <= 3


def test_uniform_neg_sampling(chain_graph):
    ep, ptr = chain_graph
    K.set_seed(9)
    tgt = np.array([1, 3], np.int32)
    e, p, label, cnt = K.uniform_neg_sampling(ep, ptr, tgt, node_num=5,
                                              neg_sample_scale=1.0,
                                              replace=False)
    assert p.shape == (3,)
    for i, ind in enumerate(tgt):
        seg = slice(p[i], p[i + 1])
        pos = set(ep[ptr[ind]:ptr[ind + 1]].tolist())
        for v, lab in zip(e[seg], label[seg]):
            if lab == 1:
                assert v in pos
            else:
                assert v not in pos  # negatives are true non-neighbors


def test_sample_and_merge(chain_graph):
    ep, ptr = chain_graph
    K.set_seed(11)
    node_ids = np.arange(5, dtype=np.int32) * 100
    sel = np.array([1, 3], np.int32)
    dst_ep, dst_ptr, merged, sel_pos = K.random_sel_neighbor_and_merge(
        ep, ptr, node_ids, sel, num_neighbors=-1)
    # merged contains selected + all neighbors, first-occurrence order
    assert merged[sel_pos[0]] == 100 and merged[sel_pos[1]] == 300
    # node 1 neighbors: 0, 2; node 3 neighbors: 2, 4
    got_nbrs_1 = {int(merged[i]) for i in dst_ep[dst_ptr[0]:dst_ptr[1]]}
    assert got_nbrs_1 == {0, 200}
    got_nbrs_3 = {int(merged[i]) for i in dst_ep[dst_ptr[1]:dst_ptr[2]]}
    assert got_nbrs_3 == {200, 400}


@pytest.mark.skipif(not K.has_native(), reason="native ext not built")
def test_fallback_contract_matches_native(chain_graph):
    """NumPy fallbacks honour the same contracts (not the same RNG)."""
    import stargcn_tpu.graph.kernels as km

    ep, ptr = chain_graph
    saved = km._native
    try:
        km._native = None
        K.set_seed(3)
        src, dst = km.random_walk(ep, ptr, 0, 100, 0.1, 5, 50)
        for s, d in zip(src, dst):
            assert d in ep[ptr[s]:ptr[s + 1]]
        e, p, label, cnt = km.uniform_neg_sampling(
            ep, ptr, np.array([2], np.int32), 5, 1.0, False)
        pos = set(ep[ptr[2]:ptr[2 + 1]].tolist())
        for v, lab in zip(e, label):
            assert (v in pos) == (lab == 1)
        de, dp, mi, sp = km.random_sel_neighbor_and_merge(
            ep, ptr, np.arange(5, dtype=np.int32), np.array([1], np.int32),
            -1)
        assert {int(mi[i]) for i in de} == {0, 2}
    finally:
        km._native = saved


def test_uniform_neg_sampling_distribution():
    """Negatives must be (near-)uniform over the non-neighbor set.

    The native swap-pool construction (graph_kernels.cpp
    py_uniform_neg_sampling) is intricate; this checks the
    DISTRIBUTION, not just the non-neighbor property: over many draws,
    each valid negative of a node should appear with frequency within a
    tight band of uniform.
    """
    # star-ish graph: node 0 connects to 1,2; nodes 3..22 are the
    # candidate negatives (20 of them).
    n = 23
    ep = np.array([1, 2], np.int32)
    ptr = np.zeros(n + 1, np.int32)
    ptr[1:] = 2  # only node 0 has neighbors
    tgt = np.array([0], np.int32)
    counts = np.zeros(n, np.int64)
    trials = 4000
    K.set_seed(1234)
    for _ in range(trials):
        e, p, label, cnt = K.uniform_neg_sampling(
            ep, ptr, tgt, node_num=n, neg_sample_scale=1.0, replace=False)
        negs = e[label == -1]  # negatives are labeled -1
        # negatives are non-neighbors and not duplicated within a draw
        assert np.unique(negs).size == negs.size
        for v in negs:
            assert v not in (1, 2)
            counts[v] += 1
    cand = np.concatenate([[0], np.arange(3, n)])  # non-neighbors of 0
    got = counts[cand]
    total = got.sum()
    assert total > 0
    expected = total / cand.size
    # chi-square-style sanity: every candidate drawn, and no candidate's
    # frequency deviates more than 25% from uniform (with ~4000 draws
    # over 21 candidates, a uniform sampler sits well inside this band).
    assert np.all(got > 0)
    assert np.all(np.abs(got - expected) < 0.25 * expected), (
        got, expected)


def test_concurrent_sampling_thread_safety():
    """The native kernels release the GIL in their compute sections
    (graph_kernels.cpp GilScopedRelease) so the sampled-mode prefetch
    thread can build plans while the main thread dispatches.  Hammer the
    RNG-carrying samplers from several threads at once: per-OS-thread
    engine slots must keep this race-free (no crash, every result
    structurally valid)."""
    import threading

    rng = np.random.RandomState(7)
    n_rows, n_cols = 300, 200
    deg = 12
    ep = rng.randint(0, n_cols, size=n_rows * deg).astype(np.int32)
    ptr = (np.arange(n_rows + 1) * deg).astype(np.int32)
    ids = np.arange(max(n_rows, n_cols), dtype=np.int32)
    K.set_seed(99)
    errors = []

    def worker():
        try:
            for _ in range(50):
                sel = rng.randint(0, n_rows, size=64).astype(np.int32)
                d_ep, d_ptr, merged, sel_pos = (
                    K.random_sel_neighbor_and_merge(ep, ptr, ids, sel, 4))
                assert d_ptr[-1] == d_ep.size
                assert np.all(d_ep >= 0) and np.all(d_ep < merged.size)
                assert np.unique(merged).size == merged.size
                e, p, lab, cnt = K.uniform_neg_sampling(
                    ep[:deg], ptr[:2].copy(), np.zeros(1, np.int32),
                    node_num=n_cols, neg_sample_scale=1.0, replace=False)
                assert p[-1] == e.size
        except Exception as exc:  # surface across the thread boundary
            errors.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


@pytest.mark.skipif(not K.has_native(), reason="native extension not built")
@pytest.mark.parametrize("deg,fanout", [(20, 8), (100, 40)])
def test_sample_block_ell_floyd_path(deg, fanout):
    """The fused planner's stochastic branch (fanout < degree) — which
    the bit-equal plan cross-check never reaches — must sample DISTINCT
    real neighbors with (near-)uniform marginals.  (20, 8) hits the
    linear-scan swap map, (100, 40) the hash-map branch
    (``graph_kernels.cpp py_sample_block_ell`` phase A)."""
    ptr = np.array([0, deg], np.int32)
    ep = np.arange(deg, dtype=np.int32)
    col_ids = (100 + np.arange(deg)).astype(np.int32)
    rating = (np.arange(deg) % 5).astype(np.int32)
    inv_row = np.array([0.5], np.float32)
    inv_col = np.linspace(0.1, 1.0, deg).astype(np.float32)
    gid_to_local = {int(g): i for i, g in enumerate(col_ids)}
    K.set_seed(7)
    counts = np.zeros(deg, np.int64)
    trials = 600
    for _ in range(trials):
        pos, w, r, merged = K.sample_block_ell(
            ptr, ep, col_ids, rating, inv_row, inv_col,
            np.zeros(1, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.int64), int(col_ids.max()) + 1,
            fanout, 1, 1, 10**6)
        pos, w, r = pos[0], w[0], r[0]
        # every slot filled (deg > fanout), no duplicate neighbors
        assert np.unique(pos).size == fanout
        gids = merged[pos]
        locs = np.array([gid_to_local[int(g)] for g in gids])
        counts[locs] += 1
        # support and rating must be the picked edge's, not garbage
        np.testing.assert_allclose(w, 0.5 * inv_col[locs], rtol=1e-6)
        np.testing.assert_array_equal(r, rating[locs])
    # uniform marginal: each neighbor expected in fanout/deg of trials
    freq = counts / trials
    expect = fanout / deg
    assert np.all(np.abs(freq - expect) < 0.1), freq


@pytest.mark.skipif(not K.has_native(), reason="native extension not built")
def test_sample_block_ell_frontier_seeding():
    """Neighbor ids already in the carried frontier must reuse the
    frontier position (first-occurrence intern contract of
    ``unique_inverse(concat(frontier, nbr_ids))``)."""
    ptr = np.array([0, 3], np.int32)
    ep = np.array([0, 1, 2], np.int32)
    col_ids = np.array([100, 200, 300], np.int32)
    rating = np.zeros(3, np.int32)
    inv = np.ones(3, np.float32)
    frontier = np.array([200, 42], np.int32)
    pos, w, r, merged = K.sample_block_ell(
        ptr, ep, col_ids, rating, np.ones(1, np.float32), inv,
        np.zeros(1, np.int32), frontier, np.zeros(0, np.int64),
        301, 3, 1, 1, 10**6)
    np.testing.assert_array_equal(merged[:2], frontier)
    assert set(merged.tolist()) == {200, 42, 100, 300}
    # the edge to gid 200 reuses frontier slot 0 (200 is frontier[0]);
    # the new gids 100/300 intern after the 2-element frontier
    np.testing.assert_array_equal(pos[0], [2, 0, 3])

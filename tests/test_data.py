"""Data pipeline tests: parsers (via synthetic ml-100k-format files),
splits, and the DataIterator masking semantics."""

import numpy as np
import pytest

from stargcn_tpu.data import DataIterator, LoadData, NegEdgeGenerator
from stargcn_tpu.data.synthetic import synthetic_graph, write_ml100k_format


@pytest.fixture(scope="module")
def tiny_ml100k(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    write_ml100k_format(str(root / "ml-100k"))
    return str(root)


def test_load_data_transductive(tiny_ml100k):
    data = LoadData("ml-100k", root=tiny_ml100k, seed=5)
    g = data.graph
    g.check_continous_node_ids()
    g.check_consistency()
    csr = g["user", "movie"]
    assert csr.multi_link is not None and len(csr.multi_link) >= 2
    # user features: age/50, gender, occupation one-hot
    assert data.user_features.shape[0] == data.num_user
    assert data.user_features.shape[1] >= 3
    assert np.all(data.user_features[:, 0] <= 70 / 50.0 + 1e-6)
    # movie features: 300-d title emb + year + genres(19)
    assert data.item_features.shape[1] == 300 + 1 + 19
    # splits: valid values must match the valid pairs (reference bug fixed)
    vp, vv = data.valid_data
    np.testing.assert_array_equal(
        g.fetch_edges_by_id("user", "movie", vp), vv)
    tp, tv = data.test_data
    np.testing.assert_array_equal(
        g.fetch_edges_by_id("user", "movie", tp), tv)
    # no overlap between valid and test pairs
    vkeys = set(map(tuple, vp.T))
    tkeys = set(map(tuple, tp.T))
    assert not (vkeys & tkeys)


def test_load_data_inductive(tiny_ml100k):
    data = LoadData("ml-100k", root=tiny_ml100k, use_inductive=True,
                    inductive_key="item", inductive_node_frac=20,
                    inductive_edge_frac=50, seed=5)
    tr = data.inductive_train_ids
    va = data.inductive_valid_ids
    te = data.inductive_test_ids
    n_items = data.num_item
    assert tr.size + va.size + te.size == n_items
    assert not (set(tr.tolist()) & set(te.tolist()))
    # hidden test edges belong to test nodes only
    tp, _ = data.test_data
    assert set(tp[1].tolist()) <= set(te.tolist())
    # test nodes have degree > 10 (reference datasets.py:199)
    csr = data.graph["user", "movie"]
    for node in te:
        assert csr.col_degrees[node] > 10


def test_load_data_ml1m_format(tmp_path):
    from stargcn_tpu.data.synthetic import write_ml1m_format

    write_ml1m_format(str(tmp_path / "ml-1m"))
    data = LoadData("ml-1m", root=str(tmp_path), seed=7, test_ratio=0.2,
                    val_ratio=0.1)
    g = data.graph
    g.check_continous_node_ids()
    # ml-1m movie features: 300 title + 1 year + 18 genres
    assert data.item_features.shape[1] == 300 + 1 + 18
    vp, vv = data.valid_data
    np.testing.assert_array_equal(
        g.fetch_edges_by_id("user", "movie", vp), vv)


def test_load_data_ml10m_format(tmp_path):
    from stargcn_tpu.data.synthetic import write_ml10m_format

    write_ml10m_format(str(tmp_path / "ml-10M100K"))
    data = LoadData("ml-10m", root=str(tmp_path), seed=7, test_ratio=0.2,
                    val_ratio=0.1)
    g = data.graph
    g.check_continous_node_ids()
    # ml-10m: no user file -> single-zero user features; half-star ratings
    assert data.user_features.shape[1] == 1
    assert np.all(data.user_features == 0)
    assert data.item_features.shape[1] == 300 + 1 + 19  # 18 + IMAX
    assert len(data.uniq_ratings) > 5  # half-star levels present


def test_data_iterator_transductive(rng):
    g = synthetic_graph(num_users=30, num_items=40, num_edges=400, seed=1)
    csr = g["user", "movie"]
    pairs = csr.node_pair_ids
    perm = rng.permutation(pairs.shape[1])
    test_pairs = pairs[:, perm[:60]]
    valid_pairs = pairs[:, perm[60:100]]
    it = DataIterator(g, "user", "movie", test_node_pairs=test_pairs,
                      valid_node_pairs=valid_pairs, embed_P_mask=0.2,
                      embed_p_zero=0.5, embed_p_self=0.5, seed=7)
    assert it.test_graph["user", "movie"].nnz == csr.nnz - 60
    assert it.val_graph["user", "movie"].nnz == csr.nnz - 100
    assert it.train_graph is it.val_graph
    # transductive eval noise: identity for all nodes
    for key in ("user", "movie"):
        noise = it.evaluate_embed_noise_dict[key]
        np.testing.assert_array_equal(noise, np.arange(noise.size))

    # train sampler: random batches of requested size from train edges
    sampler = it.rating_sampler(batch_size=32, segment="train")
    bp, br = next(sampler)
    assert bp.shape == (2, 32) and br.shape == (32,)
    train_keys = set(map(tuple, it.train_node_pairs.T))
    assert set(map(tuple, bp.T)) <= train_keys

    # sequential eval sampler covers everything exactly once
    got = 0
    for bp, br in it.rating_sampler(batch_size=23, segment="valid"):
        got += br.size
        np.testing.assert_array_equal(
            g.fetch_edges_by_id("user", "movie", bp), br)
    assert got == 40

    # recon sampler semantics
    recon = it.recon_nodes_sampler(batch_size=10**6)
    noise_dict, batch_ids, all_ids = next(recon)
    for key in ("user", "movie"):
        n_nodes = g.node_ids[key].size
        n_recon = int(np.ceil(0.2 * n_nodes))
        assert all_ids[key].size == n_recon
        assert batch_ids[key].size == n_recon
        noise = noise_dict[key]
        # non-recon nodes keep identity
        non_recon = np.setdiff1d(np.arange(n_nodes), all_ids[key])
        np.testing.assert_array_equal(noise[non_recon], non_recon)
        # recon nodes: either -1 (zero-mask) or identity (self)
        rn = noise[all_ids[key]]
        assert np.all((rn == -1) | (rn == all_ids[key]))


def test_data_iterator_inductive(rng):
    g = synthetic_graph(num_users=30, num_items=50, num_edges=600, seed=2)
    csr = g["user", "movie"]
    item_ids = np.arange(50, dtype=np.int32)
    test_ids = item_ids[40:]
    valid_ids = item_ids[30:40]
    train_ids = item_ids[:30]
    # hidden eval edges: all edges of held-out items
    all_pairs = csr.node_pair_ids
    test_pairs = all_pairs[:, np.isin(all_pairs[1], test_ids)]
    valid_pairs = all_pairs[:, np.isin(all_pairs[1], valid_ids)]
    it = DataIterator(g, "user", "movie", is_inductive=True,
                      test_node_pairs=test_pairs,
                      valid_node_pairs=valid_pairs,
                      inductive_key="movie",
                      inductive_train_ids=train_ids,
                      inductive_valid_ids=valid_ids,
                      embed_P_mask=0.4,
                      embed_p_zero={"movie": 1.0, "user": 0.0},
                      embed_p_self={"movie": 0.0, "user": 1.0}, seed=3)
    # train graph only contains train items
    assert set(it.train_graph.node_ids["movie"].tolist()) == \
        set(train_ids.tolist())
    # eval noise: held-out items masked to -1 (cold start), users identity
    noise_m = it.evaluate_embed_noise_dict["movie"]
    np.testing.assert_array_equal(noise_m[test_ids], -1)
    np.testing.assert_array_equal(noise_m[train_ids], train_ids)
    noise_u = it.evaluate_embed_noise_dict["user"]
    np.testing.assert_array_equal(noise_u, np.arange(30))
    # recon: movie nodes all zero-masked (p_zero=1), users all self
    noise_dict, _, all_ids = next(it.recon_nodes_sampler(batch_size=10**6))
    np.testing.assert_array_equal(noise_dict["movie"][all_ids["movie"]], -1)
    np.testing.assert_array_equal(noise_dict["user"][all_ids["user"]],
                                  all_ids["user"])


def test_neg_edge_generator(rng):
    g = synthetic_graph(num_users=15, num_items=12, num_edges=60, seed=4)
    csr = g["user", "movie"]
    gen = NegEdgeGenerator(rng, csr)
    pos = csr.node_pair_ids[:, :20]
    for mode in ("all", "same_node"):
        neg = gen.gen(pos, neg_sample_type=mode, neg_ratio=1.0)
        assert neg.shape[1] == 20
        # every generated pair is a non-edge
        vals = csr.fetch_edges_by_id(neg)
        np.testing.assert_array_equal(vals, np.zeros(20))
    # same_node keeps one endpoint of each positive
    neg = gen.gen(pos, neg_sample_type="same_node")
    kept = (neg[0] == pos[0]) | (neg[1] == pos[1])
    assert kept.all()


def test_neg_edge_generator_uniform_coverage(rng):
    """Rank-space inversion is exact: over many draws every non-edge is
    hit, no edge ever is, and the empirical distribution is flat."""
    g = synthetic_graph(num_users=6, num_items=5, num_edges=14, seed=7)
    csr = g["user", "movie"]
    dense = np.zeros(csr.shape, bool)
    pi = csr.node_pair_indices
    dense[pi[0], pi[1]] = True
    non_edges = int((~dense).sum())

    gen = NegEdgeGenerator(rng, csr)
    n = 200 * non_edges
    rows, cols = gen.sample_pairs(n)
    assert not dense[rows, cols].any()
    counts = np.zeros(csr.shape, np.int64)
    np.add.at(counts, (rows, cols), 1)
    hit = counts[~dense]
    assert (hit > 0).all()                      # full support
    assert hit.max() < 2.0 * hit.mean()         # roughly flat

    # conditional draws cover each row's full complement
    r = int(np.argmax((~dense).sum(1)))
    draws = gen.sample_cols_for_rows(np.full(100 * csr.shape[1], r))
    assert set(draws) == set(np.flatnonzero(~dense[r]))
    c = int(np.argmax((~dense).sum(0)))
    draws = gen.sample_rows_for_cols(np.full(100 * csr.shape[0], c))
    assert set(draws) == set(np.flatnonzero(~dense[:, c]))


class TestGlove:
    """load_glove + the title-embedding path (reference datasets.py:574-590).

    The real glove.840B.300d.txt contains multi-word tokens, so the
    fixture includes one to pin the right-anchored parse."""

    DIM = 12

    @pytest.fixture()
    def glove_file(self, tmp_path):
        def vec(seed):
            return " ".join(f"{v:.4f}" for v in
                            np.random.RandomState(seed).normal(size=self.DIM))

        path = tmp_path / "glove.txt"
        path.write_text(
            f"movie {vec(1)}\n"
            f"the {vec(2)}\n"
            f". . . {vec(3)}\n"          # multi-word token (real-file case)
            "shorty 1 2 3\n"             # malformed short line: skipped
            f"broken x y {vec(4)[8:]}\n"  # non-numeric tail: skipped
        )
        return str(path)

    def test_load_glove_right_anchored(self, glove_file):
        from stargcn_tpu.data.movielens import load_glove
        table = load_glove(glove_file)
        assert set(table) == {"movie", "the", ". . ."}
        assert all(v.shape == (self.DIM,) for v in table.values())
        exp = np.random.RandomState(3).normal(size=self.DIM)
        np.testing.assert_allclose(table[". . ."], exp, atol=1e-3)

    def test_title_embeddings_from_glove(self, tiny_ml100k, glove_file):
        from stargcn_tpu.data.movielens import GENRES_ML_100K, load_glove
        data = LoadData("ml-100k", root=tiny_ml100k, seed=5,
                        glove_path=glove_file)
        feats = data.item_features
        # [emb(DIM), year, genres] — fixture titles are "Movie N (year)"
        assert feats.shape[1] == self.DIM + 1 + len(GENRES_ML_100K)
        table = load_glove(glove_file)
        # every fixture title tokenizes to ['movie'], all of which are
        # in the table, so emb == glove['movie'] exactly
        np.testing.assert_allclose(feats[:, :self.DIM],
                                   np.tile(table["movie"], (len(feats), 1)),
                                   rtol=1e-5)
        years = feats[:, self.DIM]
        assert np.all((years >= 0.0) & (years <= 0.5))


def test_synthetic_structured_graph_plants_affinity():
    """The structured fixture must carry the signal ranking measures:
    in-group edges rate {4,5}, out-group {1,2}, full node coverage."""
    from stargcn_tpu.data.synthetic import synthetic_structured_graph

    g = synthetic_structured_graph(num_users=120, num_items=90,
                                   num_edges=2500, groups=4, seed=3)
    csr = g["user", "movie"]
    assert csr.shape == (120, 90)
    deg_u = np.diff(csr.ind_ptr)
    assert (deg_u > 0).all()
    assert (np.diff(csr.T.ind_ptr) > 0).all()
    vals = np.bincount(csr.values.astype(int), minlength=6)
    # bimodal ratings: high levels dominate (in-group majority)
    assert vals[4] + vals[5] > vals[1] + vals[2] > 0

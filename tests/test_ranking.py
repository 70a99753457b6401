"""Ranking evaluation (HR@K / NDCG@K) — the NegEdgeGenerator's consumer.

Pins the protocol of ``stargcn_tpu/ranking.py``: negatives are true
non-edges of the evaluation graph, ranks count strictly-greater scores,
metrics are batch-size invariant, and a perfect/anti-perfect artifact
scores 1/0 exactly.
"""

import numpy as np
import pytest

from stargcn_tpu.data import DataIterator, NegEdgeGenerator
from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.ranking import rank_eval, rank_eval_from_iterator


class _Art:
    def __init__(self, U, I):
        self.user_feats = np.asarray(U, np.float32)
        self.item_feats = np.asarray(I, np.float32)


def _graph(seed=5, nu=25, ni=18, ne=160):
    g = synthetic_graph(num_users=nu, num_items=ni, num_edges=ne, seed=seed)
    return g["user", "movie"]


def test_perfect_artifact_scores_one(rng):
    """U[u] = one-hot of u's positive item, I = identity: the positive's
    score is 1, every other item's 0 -> rank 0 always."""
    csr = _graph()
    nu, ni = csr.shape
    pi = csr.node_pair_indices
    uu, ii = np.asarray(pi[0][:40]), np.asarray(pi[1][:40])
    U = np.zeros((nu, ni), np.float32)
    U[uu, ii] = 1.0  # a user with several positives ranks any of them top-1
    art = _Art(U, np.eye(ni, dtype=np.float32))
    gen = NegEdgeGenerator(rng, csr)
    out = rank_eval(art, uu, ii, gen, num_negatives=12, k=5, batch_size=16)
    assert out["hr"] == 1.0
    assert out["ndcg"] == 1.0
    assert out["num_positives"] == 40


def test_anti_perfect_artifact_scores_zero(rng):
    """Positive scored strictly below every candidate -> rank = N,
    outside any K < N."""
    csr = _graph(seed=9)
    nu, ni = csr.shape
    pi = csr.node_pair_indices
    uu, ii = np.asarray(pi[0][:30]), np.asarray(pi[1][:30])
    U = np.zeros((nu, ni), np.float32)
    U[uu, ii] = -1.0
    art = _Art(U, np.eye(ni, dtype=np.float32))
    # only rank positives whose user has a single positive in this set
    # (multiple positives would make "every other item scores 0" false
    # for the OTHER positives drawn as negatives-impossible... negatives
    # are non-edges so never another positive; but a user's second
    # positive edge in (uu, ii) gets -1 too and ties resolve in the
    # positive's favour -> still rank on ties=0 of the negatives)
    out = rank_eval(art, uu, ii, NegEdgeGenerator(rng, csr),
                    num_negatives=10, k=10, batch_size=8)
    assert out["hr"] == 0.0
    assert out["ndcg"] == 0.0


def test_batch_size_invariance(rng):
    csr = _graph(seed=7)
    nu, ni = csr.shape
    r = np.random.RandomState(3)
    art = _Art(r.randn(nu, 6), r.randn(ni, 6))
    pi = csr.node_pair_indices
    uu, ii = np.asarray(pi[0]), np.asarray(pi[1])
    outs = []
    for bs in (3, 17, 4096):
        outs.append(rank_eval(art, uu, ii,
                              NegEdgeGenerator(np.random.RandomState(11),
                                               csr),
                              num_negatives=20, k=5, batch_size=bs))
    for o in outs[1:]:
        assert o["hr"] == pytest.approx(outs[0]["hr"], abs=1e-6)
        assert o["ndcg"] == pytest.approx(outs[0]["ndcg"], abs=1e-6)


def test_negatives_are_non_edges_and_rng_grouped_draw_exact(rng):
    """The grouped-vectorised _RankSpaceSampler.draw must stay exact:
    full support over non-neighbors, zero mass on edges, per-row."""
    csr = _graph(seed=13, nu=8, ni=7, ne=30)
    gen = NegEdgeGenerator(rng, csr)
    dense = np.zeros(csr.shape, bool)
    pi = csr.node_pair_indices
    dense[pi[0], pi[1]] = True
    rows = np.repeat(np.arange(csr.shape[0]), 400)
    cols = gen.sample_cols_for_rows(rows)
    assert not dense[rows, cols].any()
    for r in range(csr.shape[0]):
        got = np.unique(cols[rows == r])
        want = np.where(~dense[r])[0]
        np.testing.assert_array_equal(got, want)


def test_rank_eval_from_iterator_end_to_end(rng):
    g = synthetic_graph(num_users=30, num_items=22, num_edges=260, seed=21)
    csr = g["user", "movie"]
    pairs = csr.node_pair_ids
    perm = np.random.RandomState(0).permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:50]],
                      valid_node_pairs=pairs[:, perm[50:90]],
                      embed_P_mask=0.1, embed_p_zero=1.0,
                      embed_p_self=0.0, seed=2)
    r = np.random.RandomState(5)
    art = _Art(r.randn(csr.shape[0], 4), r.randn(csr.shape[1], 4))
    out = rank_eval_from_iterator(art, it, segment="test",
                                  num_negatives=8, k=3, batch_size=16)
    assert out["segment"] == "test"
    assert out["num_positives"] == 50
    assert 0.0 <= out["hr"] <= 1.0
    assert 0.0 <= out["ndcg"] <= out["hr"] + 1e-9
    # random features against 8 negatives: HR@3 should be near 3/9,
    # loosely bounded (50 positives)
    assert 0.05 < out["hr"] < 0.75
    # max_positives subsampling works and stays in range
    sub = rank_eval_from_iterator(art, it, segment="valid",
                                  num_negatives=8, k=3, batch_size=16,
                                  max_positives=10)
    assert sub["num_positives"] == 10


def test_predict_cli_rank_eval(tmp_path, capsys, monkeypatch):
    """The --rank_eval CLI path: synthetic dataset, untrained params,
    one JSON line with HR/NDCG in range."""
    import json
    import sys

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "DATASET:\n  NAME: synthetic\n"
        "EMBED:\n  UNITS: 8\n"
        "GCN:\n  AGG:\n    UNITS:\n    - 15\n"
        "  OUT:\n    UNITS:\n    - 10\n"
        "GEN_RATING:\n  MID_MAP: 8\n"
        "TRAIN:\n  RATING_BATCH_SIZE: 64\n")
    import experiments.predict as predict_cli
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--cfg", str(cfg), "--rank_eval",
        "--rank_k", "5", "--rank_negatives", "20",
        "--rank_max_positives", "150"])
    predict_cli.main()
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    ranked = [ln for ln in lines if ln.get("mode") == "rank_eval"]
    assert len(ranked) == 1
    out = ranked[0]
    assert out["num_positives"] == 150 and out["k"] == 5
    assert 0.0 <= out["ndcg"] <= out["hr"] <= 1.0


def test_rank_eval_rng_pins_draws_independently(rng):
    """ADVICE r3: an explicit ``rng`` must make the draws reproducible
    regardless of how far the generator's own RandomState has advanced
    (bench warm-up calls before timed calls)."""
    csr = _graph()
    nu, ni = csr.shape
    pi = csr.node_pair_indices
    uu, ii = np.asarray(pi[0][:30]), np.asarray(pi[1][:30])
    art = _Art(np.random.RandomState(0).randn(nu, 8),
               np.random.RandomState(1).randn(ni, 8))
    gen = NegEdgeGenerator(np.random.RandomState(7), csr)
    # advance the generator's internal state (simulates a warm-up call)
    gen.sample_cols_for_rows(uu)
    a = rank_eval(art, uu, ii, gen, num_negatives=20, k=5,
                  rng=np.random.RandomState(3))
    gen.sample_cols_for_rows(uu)  # advance again, differently
    b = rank_eval(art, uu, ii, gen, num_negatives=20, k=5,
                  rng=np.random.RandomState(3))
    assert a == b


def test_rank_eval_rejects_empty_and_bad_segment(rng):
    csr = _graph()
    art = _Art(np.zeros((csr.shape[0], 4)), np.zeros((csr.shape[1], 4)))
    gen = NegEdgeGenerator(rng, csr)
    with pytest.raises(ValueError, match="zero positives"):
        rank_eval(art, np.empty(0, np.int64), np.empty(0, np.int64), gen)

    class _FakeIter:
        pass

    with pytest.raises(ValueError, match="segment"):
        rank_eval_from_iterator(art, _FakeIter(), segment="train")

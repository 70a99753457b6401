"""Serving path: artifact export, predict parity, top-K recommendation.

The serving design (``stargcn_tpu/serve.py``) factors the eval forward
into a one-time encoder run + inner-product scoring; these tests pin the
factorisation to ``Trainer.predict`` (the reference-shaped eval path,
``STAR-GCN.py:465-498``) bit-for-bit on the same segment.
"""

import numpy as np

from stargcn_tpu.data import DataIterator
from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.serve import Predictor, ServingArtifact, export_serving
from stargcn_tpu.train import Trainer, build_model_config
from stargcn_tpu.train.loop import TrainSettings
from stargcn_tpu.utils import default_cfg


def make_trainer(**cfg_overrides):
    cfg = default_cfg()
    cfg.EMBED.UNITS = 8
    cfg.GCN.AGG.UNITS = [15]
    cfg.GCN.OUT.UNITS = [10]
    cfg.GCN.DROPOUT = 0.3
    cfg.GEN_RATING.MID_MAP = 8
    cfg.TRAIN.RATING_BATCH_SIZE = 64
    for k, v in cfg_overrides.items():
        parts = k.split(".")
        node = cfg
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v

    g = synthetic_graph(num_users=40, num_items=30, num_edges=500, seed=3)
    csr = g["user", "movie"]
    rng = np.random.RandomState(0)
    pairs = csr.node_pair_ids
    perm = rng.permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:80]],
                      valid_node_pairs=pairs[:, perm[80:140]],
                      embed_P_mask=cfg.EMBED.MASK_PROP,
                      embed_p_zero=cfg.EMBED.P_ZERO,
                      embed_p_self=1.0 - cfg.EMBED.P_ZERO, seed=11)
    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link))
    return Trainer(model_cfg, it, TrainSettings.from_cfg(cfg))


def test_predict_matches_trainer():
    trainer = make_trainer()
    art = export_serving(trainer, segment="test")
    pred = Predictor(art, batch_size=32)
    rng = np.random.RandomState(7)
    uu = rng.randint(0, 40, size=100).astype(np.int32)
    ii = rng.randint(0, 30, size=100).astype(np.int32)
    got = pred.predict(uu, ii)
    want = trainer.predict(uu, ii, segment="test")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_predict_matches_trainer_valid_segment():
    trainer = make_trainer()
    art = export_serving(trainer, segment="valid")
    pred = Predictor(art)
    uu = np.arange(40, dtype=np.int32)
    ii = (np.arange(40) % 30).astype(np.int32)
    np.testing.assert_allclose(
        pred.predict(uu, ii), trainer.predict(uu, ii, segment="valid"),
        rtol=1e-5, atol=1e-5)


def test_recommend_topk_excludes_rated():
    trainer = make_trainer()
    art = export_serving(trainer, segment="test")
    pred = Predictor(art, recommend_batch=8)
    users = np.arange(40, dtype=np.int32)
    idx, vals = pred.recommend(users, k=5)
    assert idx.shape == (40, 5) and vals.shape == (40, 5)
    # Scores sorted descending, within the rating range.
    assert (np.diff(vals, axis=1) <= 1e-6).all()
    assert (vals >= art.rating_min - 1e-6).all()
    assert (vals <= art.rating_max + 1e-6).all()
    # No already-rated item is ever recommended.
    for u in users:
        lo, hi = art.rated_indptr[u], art.rated_indptr[u + 1]
        rated = set(art.rated_items[lo:hi].tolist())
        assert not (set(idx[u].tolist()) & rated), f"user {u}"


def test_recommend_matches_bruteforce():
    trainer = make_trainer()
    art = export_serving(trainer, segment="test")
    pred = Predictor(art)
    u = np.int32(3)
    all_items = np.arange(30, dtype=np.int32)
    scores = pred.predict(np.full(30, u, np.int32), all_items)
    idx, vals = pred.recommend([u], k=4, exclude_rated=False)
    # Clipping can create score ties; compare by score value.
    np.testing.assert_allclose(np.sort(scores)[::-1][:4], vals[0],
                               rtol=1e-6, atol=1e-6)


def test_artifact_roundtrip(tmp_path):
    trainer = make_trainer()
    art = export_serving(trainer, segment="test")
    path = str(tmp_path / "artifact.npz")
    art.save(path)
    art2 = ServingArtifact.load(path)
    np.testing.assert_array_equal(art.user_feats, art2.user_feats)
    np.testing.assert_array_equal(art.item_feats, art2.item_feats)
    assert art2.rating_mean == art.rating_mean
    assert art2.rated_indptr is not None
    uu = np.arange(10, dtype=np.int32)
    ii = np.arange(10, dtype=np.int32) % 30
    np.testing.assert_allclose(Predictor(art).predict(uu, ii),
                               Predictor(art2).predict(uu, ii))


def test_export_serving_backends_agree():
    # The artifact must be backend-invariant: dense-MXU vs the flat-edge
    # xla path produce the same scoring matrices.
    t_xla = make_trainer(**{"KERNEL.BACKEND": "xla"})
    t_dense = make_trainer(**{"KERNEL.BACKEND": "dense"})
    # Same init seeds -> same params; guard against accidental drift.
    a = export_serving(t_xla, segment="test")
    b = export_serving(t_dense, segment="test")
    np.testing.assert_allclose(a.user_feats, b.user_feats,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(a.item_feats, b.item_feats,
                               rtol=2e-4, atol=2e-4)

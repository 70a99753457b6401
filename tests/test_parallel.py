"""Multi-device tests on the virtual 8-device CPU mesh.

Exercises the full sharded training step (DP batch sharding, edge-sharded
aggregation, row-sharded embedding tables) and checks numerical agreement
with the single-device path.
"""

import jax
import numpy as np
import pytest

from stargcn_tpu.data import DataIterator
from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.parallel import GraphShardings, make_mesh
from stargcn_tpu.train import Trainer, build_model_config
from stargcn_tpu.train.loop import TrainSettings
from stargcn_tpu.utils import default_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def make_trainer(mesh, num_users=64, num_items=64, seed=3):
    cfg = default_cfg()
    cfg.EMBED.UNITS = 8
    cfg.GCN.AGG.UNITS = [15]
    cfg.GCN.OUT.UNITS = [10]
    cfg.GCN.DROPOUT = 0.0
    cfg.GEN_RATING.MID_MAP = 8
    cfg.TRAIN.RATING_BATCH_SIZE = 64
    cfg.TRAIN.LR = 5e-3

    g = synthetic_graph(num_users=num_users, num_items=num_items,
                        num_edges=800, seed=seed)
    csr = g["user", "movie"]
    rng = np.random.RandomState(0)
    pairs = csr.node_pair_ids
    perm = rng.permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:100]],
                      valid_node_pairs=pairs[:, perm[100:180]],
                      embed_P_mask=0.1, embed_p_zero=0.0,
                      embed_p_self=1.0, seed=11)
    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link))
    return Trainer(model_cfg, it, TrainSettings.from_cfg(cfg), mesh=mesh)


def test_mesh_construction():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(data=16, model=16)


def test_sharded_step_runs_and_matches_single_device():
    mesh = make_mesh(data=2, model=4)
    t_mesh = make_trainer(mesh)
    t_single = make_trainer(None)

    # identical params (same seed init) — verify, then run one identical
    # deterministic step (dropout 0) on both and compare losses.
    for a, b in zip(jax.tree.leaves(t_single.params),
                    jax.tree.leaves(t_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    batch = next(t_single.data_iter.rating_sampler(64, "train"))
    noise, _, all_ids = next(
        t_single.data_iter.recon_nodes_sampler(batch_size=10**6))
    recon = t_single.prepare_recon_batch(noise, all_ids)

    stats_s = jax.device_get(t_single.train_iteration(batch, recon))
    stats_m = jax.device_get(t_mesh.train_iteration(batch, recon))
    np.testing.assert_allclose(stats_s["loss"], stats_m["loss"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats_s["sq_err"], stats_m["sq_err"],
                               rtol=1e-4, atol=1e-4)
    # params after the step agree
    for a, b in zip(jax.tree.leaves(t_single.params),
                    jax.tree.leaves(t_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_embedding_tables_row_sharded():
    mesh = make_mesh(data=2, model=4)
    t = make_trainer(mesh)
    emb = t.params["embed_user"]["embedding"]
    spec = emb.sharding.spec
    assert spec[0] == "model", f"expected row-sharded table, got {spec}"
    # edge arrays sharded over 'model'
    assert t.graph_data.edge_user.sharding.spec[0] == "model"


def test_sharded_evaluate():
    mesh = make_mesh(data=4, model=2)
    t = make_trainer(mesh)
    rmse = t.evaluate("valid")
    assert rmse.shape == (2,)
    assert np.all(np.isfinite(rmse))


def test_sharded_fit_short():
    mesh = make_mesh(data=2, model=2)
    t = make_trainer(mesh)
    result = t.fit(max_iter=20)
    baseline = float(t.data_iter.train_ratings.std())
    assert result["best_valid_rmse"] < baseline * 1.05


def test_sharded_bitdense_step_matches_single_device():
    """Edge-set sharding, dense-MXU instance: bit-packed adjacency rows
    sharded over 'model' (forward M-parallel, backward psum via GSPMD)
    must match the single-device bitdense step numerically."""
    mesh = make_mesh(data=2, model=4)

    def bit_trainer(m):
        cfg = default_cfg()
        cfg.EMBED.UNITS = 8
        cfg.GCN.AGG.UNITS = [15]
        cfg.GCN.OUT.UNITS = [10]
        cfg.GCN.DROPOUT = 0.0
        cfg.GEN_RATING.MID_MAP = 8
        cfg.TRAIN.RATING_BATCH_SIZE = 64
        cfg.TRAIN.LR = 5e-3
        cfg.KERNEL.BACKEND = "bitdense"
        cfg.KERNEL.BIT_IMPL = "xla"
        g = synthetic_graph(num_users=64, num_items=64, num_edges=800,
                            seed=3)
        csr = g["user", "movie"]
        rng = np.random.RandomState(0)
        pairs = csr.node_pair_ids
        perm = rng.permutation(pairs.shape[1])
        it = DataIterator(g, "user", "movie",
                          test_node_pairs=pairs[:, perm[:100]],
                          valid_node_pairs=pairs[:, perm[100:180]],
                          embed_P_mask=0.1, embed_p_zero=0.0,
                          embed_p_self=1.0, seed=11)
        model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                       len(csr.multi_link))
        assert model_cfg.backend == "bitdense"
        return Trainer(model_cfg, it, TrainSettings.from_cfg(cfg), mesh=m)

    t_mesh = bit_trainer(mesh)
    t_single = bit_trainer(None)
    batch = next(t_single.data_iter.rating_sampler(64, "train"))
    noise, _, all_ids = next(
        t_single.data_iter.recon_nodes_sampler(batch_size=10**6))
    recon = t_single.prepare_recon_batch(noise, all_ids)
    stats_s = jax.device_get(t_single.train_iteration(batch, recon))
    stats_m = jax.device_get(t_mesh.train_iteration(batch, recon))
    np.testing.assert_allclose(stats_s["loss"], stats_m["loss"],
                               rtol=1e-4, atol=1e-5)
    # the pack really is row-sharded on the mesh
    pack = t_mesh.ell_packs.get("train", t_mesh.edge_masks["train"])
    assert pack["user"]["pf"].sharding.spec[0] == "model"
    # params after the step agree
    for a, b in zip(jax.tree.leaves(t_single.params),
                    jax.tree.leaves(t_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_sharded_device_sampler_matches_single_device():
    """TRAIN.DEVICE_SAMPLER on a mesh: the replicated on-device draw +
    DP sharding constraint must reproduce the single-device chunk
    exactly (same RNG key sequence -> same batches -> same params)."""
    t_mesh = make_trainer(make_mesh(data=2, model=4))
    t_single = make_trainer(None)
    for t in (t_mesh, t_single):
        t.s.device_sampler = True
    stats_s = jax.device_get(t_single.train_chunk_dev(3))
    stats_m = jax.device_get(t_mesh.train_chunk_dev(3))
    np.testing.assert_allclose(stats_s["loss"], stats_m["loss"],
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(t_single.params),
                    jax.tree.leaves(t_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

"""Sampled mini-batch forward vs full-graph forward parity.

With fanout = -1 (all neighbors, as in every shipped reference config)
and dropout off, the sampled two-phase path must reproduce the
full-graph predictions exactly on the target nodes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.graph.device import BipartiteGraphData
from stargcn_tpu.graph.sampling import BlockSampler
from stargcn_tpu.models import STARGCN, STARGCNConfig
from stargcn_tpu.models.sampled import StackedPlan, sampled_forward


@pytest.fixture(scope="module")
def setup():
    g = synthetic_graph(num_users=30, num_items=22, num_edges=260,
                        rating_values=(1, 2, 3), seed=2)
    csr = g["user", "movie"]
    cfg = STARGCNConfig(
        num_users=30, num_items=22, num_links=3, nblocks=2,
        embed_units=8, agg_units=(12,), out_units=(10,),
        gcn_dropout=0.0, gen_rating_mid_map=6, agg_accum="stack")
    model = STARGCN(cfg)
    gd = BipartiteGraphData.from_csr(csr, pad_multiple=64)
    rng = np.random.RandomState(1)
    B = 12
    pu = rng.randint(0, 30, B).astype(np.int32)
    pi = rng.randint(0, 22, B).astype(np.int32)
    nu = jnp.arange(30, dtype=jnp.int32)
    ni = jnp.arange(22, dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, nu, ni, jnp.asarray(pu), jnp.asarray(pi),
        train=False)["params"]
    return g, csr, gd, cfg, model, params, pu, pi, nu, ni


@pytest.mark.parametrize("accum", ["stack", "sum"])
def test_sampled_matches_full_graph(setup, accum):
    g, csr, gd, cfg0, model0, params, pu, pi, nu, ni = setup
    import dataclasses
    cfg = dataclasses.replace(cfg0, agg_accum=accum)
    model = STARGCN(cfg)
    if accum != cfg0.agg_accum:
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            gd, gd.edge_pad_mask, nu, ni, jnp.asarray(pu),
            jnp.asarray(pi), train=False)["params"]
    full = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                       jnp.asarray(pu), jnp.asarray(pi), train=False)
    plan = StackedPlan.build(g, cfg, pu, pi, fanout=-1, node_pad=32)
    out = sampled_forward(params, cfg, plan, np.asarray(nu), np.asarray(ni))
    np.testing.assert_allclose(out["pred_ratings"], full["pred_ratings"],
                               rtol=2e-4, atol=2e-4)


def test_sampled_with_masking(setup):
    """Cold-start masking flows through the sampled path identically."""
    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    noise_i = np.asarray(ni).copy()
    noise_i[::2] = -1  # mask half the items
    full = model.apply({"params": params}, gd, gd.edge_pad_mask, nu,
                       jnp.asarray(noise_i), jnp.asarray(pu),
                       jnp.asarray(pi), train=False)
    plan = StackedPlan.build(g, cfg, pu, pi, fanout=-1, node_pad=32)
    out = sampled_forward(params, cfg, plan, np.asarray(nu), noise_i)
    np.testing.assert_allclose(out["pred_ratings"], full["pred_ratings"],
                               rtol=2e-4, atol=2e-4)


def test_fanout_caps_block_width(setup):
    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    sampler = BlockSampler(g, num_layers=1, fanout=3, node_pad=16)
    blocks = sampler.sample(pu, pi)
    for t in ("user", "item"):
        blk = blocks.blocks[0][t]
        assert blk.nbr_pos.shape[1] == 3
        # at most 3 non-zero weights per row
        assert (blk.weight != 0).sum(axis=1).max() <= 3


def test_sampled_training_fixed_shapes(setup):
    """Capped sampler -> identical shapes across batches -> one compiled
    program; loss decreases over sampled training steps."""
    import optax

    from stargcn_tpu.models.sampled import (
        StackedPlan,
        make_sampled_train_step,
    )

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    caps = {"user": 64, "item": 64}
    mean = float(csr.values.mean())
    std = float(csr.values.std())
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_sampled_train_step(cfg, opt, mean, std, recon_lambda=0.1)

    rng = np.random.RandomState(0)
    pairs = csr.node_pair_ids
    losses = []
    shapes = set()
    import jax as _jax
    p = params
    for it in range(8):
        sel = rng.choice(pairs.shape[1], 12, replace=False)
        bu, bi = pairs[0, sel], pairs[1, sel]
        gt = csr.values[sel]
        plan = StackedPlan.build(
            g, cfg, bu, bi, fanout=4, frontier_caps=caps,
            recon_user_ids=bu[:4], recon_item_ids=bi[:4])
        dplan = plan.as_device()
        shapes.add(tuple(np.asarray(
            dplan["frontiers"][0]["user"]).shape))
        p, opt_state, stats = step(
            p, opt_state, dplan, jnp.asarray(nu), jnp.asarray(ni),
            jnp.asarray(gt), jnp.ones(12, jnp.float32),
            _jax.random.PRNGKey(it))
        losses.append(float(stats["loss"]))
    assert len(shapes) == 1, "frontier shapes varied -> recompiles"
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_frontier_cap_exceeded_raises(setup):
    from stargcn_tpu.graph.sampling import BlockSampler

    g, csr, *_ = setup
    sampler = BlockSampler(g, num_layers=1, fanout=8,
                           frontier_caps={"user": 4, "item": 4})
    with pytest.raises(ValueError, match="cap"):
        sampler.sample(np.arange(10, dtype=np.int32),
                       np.arange(10, dtype=np.int32))


def test_sampled_trainer_full_schedule(setup, tmp_path):
    """SampledTrainer has Trainer schedule parity: fit with interleaved
    valid/test evaluation, MetricLogger CSVs, best/last checkpoints, and
    REMOVE_RATING batch-edge exclusion; loss decreases."""
    from stargcn_tpu.data.iterators import DataIterator
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    pairs = csr.node_pair_ids
    rng = np.random.RandomState(0)
    perm = rng.permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:40]],
                      valid_node_pairs=pairs[:, perm[40:80]],
                      embed_P_mask=0.2, seed=0,
                      embed_p_zero=1.0, embed_p_self=0.0)
    s = TrainSettings(rating_batch_size=24, recon_batch_size=8,
                      max_iter=20, log_interval=5, valid_interval=10,
                      lr=1e-2, seed=3, remove_rating=True)
    trainer = SampledTrainer(cfg, it, s, fanout=4,
                             save_dir=str(tmp_path))
    assert trainer.do_remove
    result = trainer.fit(log=lambda *_: None)
    assert np.isfinite(result["best_valid_rmse"])
    assert result["best_test_rmse"] is not None
    for f in ("train_loss0.csv", "valid_loss0.csv", "test_loss0.csv",
              "ckpt_best_0.msgpack", "ckpt_last_0.msgpack", "net0.txt"):
        assert (tmp_path / f).exists(), f
    # checkpoints interchange with the full-graph Trainer param tree
    trainer.restore_checkpoint(str(tmp_path / "ckpt_best_0.msgpack"))


def test_remove_rating_excludes_batch_edges(setup):
    """With exclude_pairs, the batch edges vanish from every sampled
    neighborhood and supports reflect the reduced degrees — the sampled
    plan must equal one built from a graph with those edges removed."""
    from stargcn_tpu.graph.sampling import BlockSampler

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    batch = csr.node_pair_ids[:, :20]
    sampler = BlockSampler(g, num_layers=1, fanout=-1,
                           symm=cfg.agg_norm_symm)
    keys, rem = sampler.removal_args(batch[0], batch[1])
    blocks = sampler.sample(np.unique(batch[0]), np.unique(batch[1]),
                            exclude_keys=keys, removal_counts=rem)

    g_removed = g.remove_edges_by_id("user", "movie", batch)
    sampler2 = BlockSampler(g_removed, num_layers=1, fanout=-1,
                            symm=cfg.agg_norm_symm)
    blocks2 = sampler2.sample(np.unique(batch[0]), np.unique(batch[1]))

    # compare aggregate (dst_id, src_id, weight) multisets per direction
    def weights_of(b, lvl_idx, t, frontiers):
        lvl = b.blocks[lvl_idx][t]
        src_ids = frontiers[lvl_idx][("item" if t == "user" else "user")]
        dst_ids = frontiers[lvl_idx + 1][t]
        out = {}
        for i in range(lvl.nbr_pos.shape[0]):
            for k in range(lvl.nbr_pos.shape[1]):
                w = float(lvl.weight[i, k])
                if w != 0.0:
                    key = (int(dst_ids[i]), int(src_ids[lvl.nbr_pos[i, k]]))
                    out[key] = out.get(key, 0.0) + w
        return out

    for t in ("user", "item"):
        w1 = weights_of(blocks, 0, t, [f for f in blocks.frontiers])
        w2 = weights_of(blocks2, 0, t, [f for f in blocks2.frontiers])
        assert set(w1) == set(w2), t
        for key in w1:
            np.testing.assert_allclose(w1[key], w2[key], rtol=1e-5)


def test_sampled_pallas_backend_matches(setup):
    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    plan = StackedPlan.build(g, cfg, pu, pi, fanout=-1, node_pad=32)
    out_x = sampled_forward(params, cfg, plan, np.asarray(nu),
                            np.asarray(ni), backend="xla")
    if jax.default_backend() != "cpu":
        pytest.skip("pallas interpret check is CPU-only here")
    # pallas kernels in interpret mode on CPU
    import stargcn_tpu.models.sampled as sm
    import stargcn_tpu.ops.pallas_kernels as pk
    orig = pk.ell_spmm

    def interp_spmm(v, i, w, interpret=False):
        return orig(v, i, w, True)

    pk_ell = pk.ell_spmm
    try:
        sm_ell = interp_spmm
        pk.ell_spmm = interp_spmm
        out_p = sampled_forward(params, cfg, plan, np.asarray(nu),
                                np.asarray(ni), backend="pallas")
    finally:
        pk.ell_spmm = pk_ell
    np.testing.assert_allclose(out_p["pred_ratings"],
                               out_x["pred_ratings"], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("remove", [False, True])
def test_native_plan_matches_numpy(setup, remove, monkeypatch):
    """The fused native planner (``kernels.sample_block_ell``) must
    produce the exact plan the NumPy pipeline produces.  A fanout larger
    than every degree removes sampling randomness, so the two paths are
    bit-comparable — frontiers, ELL blocks, supports (removal-adjusted
    when REMOVE_RATING is on), exclusion zeros, and target positions."""
    from stargcn_tpu.graph import kernels as K

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    if not K.has_native():
        pytest.skip("native extension not built")
    fanout = int(max(np.diff(csr.ind_ptr).max(),
                     np.diff(g["movie", "user"].ind_ptr).max()))
    caps = {"user": 64, "item": 64}

    def build(native):
        sampler = BlockSampler(g, num_layers=len(cfg.agg_units),
                               fanout=fanout, symm=cfg.agg_norm_symm,
                               frontier_caps=caps)
        if not native:
            monkeypatch.setattr(K, "has_native", lambda: False)
        kw = dict(exclude_pairs=(pu, pi)) if remove else {}
        plan = StackedPlan.build(g, cfg, pu, pi, fanout=fanout,
                                 sampler=sampler, **kw)
        monkeypatch.undo()
        return plan

    a, b = build(native=True), build(native=False)
    for ca, cb in zip(a.chains, b.chains):
        for fa, fb in zip(ca.frontiers, cb.frontiers):
            for t in ("user", "item"):
                np.testing.assert_array_equal(fa[t], fb[t])
        for la, lb in zip(ca.blocks, cb.blocks):
            for t in ("user", "item"):
                assert la[t].num_dst_real == lb[t].num_dst_real
                np.testing.assert_array_equal(la[t].nbr_pos, lb[t].nbr_pos)
                np.testing.assert_array_equal(la[t].rating, lb[t].rating)
                np.testing.assert_allclose(la[t].weight, lb[t].weight,
                                           rtol=1e-6, atol=1e-7)
        for t in ("user", "item"):
            np.testing.assert_array_equal(ca.target_pos[t],
                                          cb.target_pos[t])
    if remove:
        # the batch's own edges must carry zero support in BOTH paths
        total_w = sum(float(blk[t].weight.sum())
                      for blk in a.chains[-1].blocks for t in ("user", "item"))
        assert total_w > 0


def test_sampled_train_chunk_matches_single_steps(setup):
    """k scan-fused sampled steps (``train_chunk``) must match k
    ``train_iteration`` calls: same RNG key sequence, same final
    params, same per-step stats (stacked along a leading k axis)."""
    from stargcn_tpu.data.iterators import DataIterator
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    pairs = csr.node_pair_ids
    rng = np.random.RandomState(0)
    perm = rng.permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:40]],
                      valid_node_pairs=pairs[:, perm[40:80]],
                      embed_P_mask=0.2, seed=0,
                      embed_p_zero=1.0, embed_p_self=0.0)
    s = TrainSettings(rating_batch_size=24, recon_batch_size=8,
                      max_iter=6, lr=1e-2, seed=3, remove_rating=True)
    trainer = SampledTrainer(cfg, it, s, fanout=4)
    rs = it.rating_sampler(batch_size=trainer.train_batch,
                           segment="train")
    recon = it.recon_nodes_sampler(batch_size=8)
    batches = [trainer._make_batch(rs, recon) for _ in range(3)]

    snap = jax.device_get((trainer.params, trainer.opt_state))
    key0 = trainer._rng_key

    single = [jax.device_get(trainer.train_iteration(b)) for b in batches]
    params_single = jax.device_get(trainer.params)

    trainer.params, trainer.opt_state = jax.tree.map(jnp.asarray, snap)
    trainer._rng_key = key0
    chunk = jax.device_get(trainer.train_chunk(batches))
    params_chunk = jax.device_get(trainer.params)

    for i, st in enumerate(single):
        for name in ("loss", "gnorm", "sq_err", "rating_loss",
                     "recon_loss"):
            np.testing.assert_allclose(
                np.asarray(chunk[name])[i], np.asarray(st[name]),
                rtol=1e-5, atol=1e-6, err_msg=f"{name}[{i}]")
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-5, atol=1e-6), params_single, params_chunk)


def test_sampled_fit_chunked(setup, tmp_path):
    """``SampledTrainer.fit`` with TRAIN.SCAN_STEPS > 1: the chunked
    schedule runs end-to-end (logging, evals, checkpoints) and trains."""
    from stargcn_tpu.data.iterators import DataIterator
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = setup
    pairs = csr.node_pair_ids
    rng = np.random.RandomState(0)
    perm = rng.permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:40]],
                      valid_node_pairs=pairs[:, perm[40:80]],
                      embed_P_mask=0.2, seed=0,
                      embed_p_zero=1.0, embed_p_self=0.0)
    s = TrainSettings(rating_batch_size=24, recon_batch_size=8,
                      max_iter=20, log_interval=10, valid_interval=10,
                      lr=1e-2, seed=3, remove_rating=True, scan_steps=5)
    trainer = SampledTrainer(cfg, it, s, fanout=4,
                             save_dir=str(tmp_path))
    result = trainer.fit(log=lambda *_: None)
    assert np.isfinite(result["best_valid_rmse"])
    assert (tmp_path / "train_loss0.csv").exists()
    assert (tmp_path / "ckpt_last_0.msgpack").exists()


def test_auto_backend_resolves_by_measured_crossover():
    """'auto' keys on the column that matters for the step kind
    (BASELINE.md round-4 crossover sweep): training = fwd+bwd, where
    Pallas never wins (best 0.98x) -> XLA at EVERY shape; forward-only
    (serving) picks Pallas only inside the measured forward win region
    (moderate frontiers, wide fanout); XLA everywhere else (and always
    off-TPU)."""
    from stargcn_tpu.train.sampled_loop import resolve_sampled_backend

    caps_small = {"user": 8192, "item": 4096}
    caps_big = {"user": 87040, "item": 17408}
    # explicit backends pass through untouched
    assert resolve_sampled_backend("pallas", caps_big, 8) == "pallas"
    assert resolve_sampled_backend("xla", caps_small, 32) == "xla"
    # this test process is CPU-pinned -> forward auto is xla too
    assert resolve_sampled_backend("auto", caps_small, 32,
                                   for_training=False) == "xla"
    # the TPU decision table, unit-tested via the rule's own terms
    import unittest.mock as mock
    with mock.patch("jax.default_backend", return_value="tpu"):
        # training: the fwd+bwd column has no Pallas win region, so
        # even the forward sweet spot resolves to xla
        for caps, fanout in ((caps_small, 32), (caps_small, 8),
                             (caps_big, 32), (caps_big, 8)):
            assert resolve_sampled_backend("auto", caps, fanout) == "xla"
        # forward-only: Pallas inside the measured win region only
        assert resolve_sampled_backend(
            "auto", caps_small, 32, for_training=False) == "pallas"
        assert resolve_sampled_backend(
            "auto", caps_small, 8, for_training=False) == "xla"
        assert resolve_sampled_backend(
            "auto", caps_big, 32, for_training=False) == "xla"
        assert resolve_sampled_backend(
            "auto", caps_big, 8, for_training=False) == "xla"

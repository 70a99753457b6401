"""On-device plan construction vs the host planner.

The device planner (``graph/device_sampling.py``) must agree with the
host ``StackedPlan`` path wherever their sampling is deterministic:
with ``fanout >= max degree`` both take EVERY neighbor (the host's
Floyd draw and the device's slot rule degenerate to the same full
neighborhood), so the forward/loss over the two plans must match to
float tolerance — including REMOVE_RATING exclusion and the
removal-adjusted supports.  Overflowed caps must reject the update
in-program and report the needed sizes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.data import DataIterator
from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.graph.device_sampling import (DeviceGraphTables,
                                               DevicePlanner,
                                               _capped_unique, _positions)
from stargcn_tpu.graph.sampling import BlockSampler
from stargcn_tpu.models.sampled import StackedPlan, sampled_forward
from stargcn_tpu.train.sampled_loop import _pairs_positions


@pytest.fixture(scope="module")
def setup():
    from stargcn_tpu.graph.device import BipartiteGraphData
    from stargcn_tpu.models import STARGCN, STARGCNConfig

    g = synthetic_graph(num_users=30, num_items=22, num_edges=260,
                        rating_values=(1, 2, 3), seed=2)
    csr = g["user", "movie"]
    cfg = STARGCNConfig(
        num_users=30, num_items=22, num_links=3, nblocks=2,
        embed_units=8, agg_units=(12,), out_units=(10,),
        gcn_dropout=0.0, gen_rating_mid_map=6, agg_accum="sum")
    model = STARGCN(cfg)
    gd = BipartiteGraphData.from_csr(csr, pad_multiple=64)
    rng = np.random.RandomState(1)
    B = 12
    pu = rng.randint(0, 30, B).astype(np.int32)
    pi = rng.randint(0, 22, B).astype(np.int32)
    nu = np.arange(30, dtype=np.int32)
    ni = np.arange(22, dtype=np.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, jnp.asarray(nu), jnp.asarray(ni),
        jnp.asarray(pu), jnp.asarray(pi), train=False)["params"]
    max_deg = int(max(np.diff(csr.ind_ptr).max(),
                      np.diff(csr.T.ind_ptr).max()))
    return g, csr, cfg, params, pu, pi, nu, ni, max_deg


def _host_plan_tree(g, cfg, pu, pi, caps, fanout, exclude):
    sampler = BlockSampler(g, num_layers=len(cfg.agg_units),
                           fanout=fanout, symm=cfg.agg_norm_symm,
                           frontier_caps=caps)
    plan = StackedPlan.build(
        g, cfg, pu, pi, fanout=fanout, sampler=sampler,
        recon_user_ids=np.array([3, 5, -1, -1], np.int32),
        recon_item_ids=np.array([2, 7, 9, -1], np.int32),
        exclude_pairs=exclude)
    tree = plan.as_device()
    tree["pairs_pos"] = jax.tree.map(
        jnp.asarray, _pairs_positions(plan, pu, pi))
    return tree


def _device_plan_tree(g, cfg, pu, pi, caps, fanout, exclude, key=None):
    tab = DeviceGraphTables.build(g, "user", "movie")
    planner = DevicePlanner(cfg, caps, fanout, symm=cfg.agg_norm_symm)
    bu_ind = jnp.take(tab.id2ind["user"], jnp.asarray(pu))
    bi_ind = jnp.take(tab.id2ind["item"], jnp.asarray(pi))
    valid = jnp.ones(pu.size, jnp.float32)
    plan, pairs_pos, aux = planner.build(
        tab, key if key is not None else jax.random.PRNGKey(7),
        bu_ind, bi_ind, valid,
        jnp.array([3, 5, -1, -1], jnp.int32),
        jnp.array([2, 7, 9, -1], jnp.int32),
        exclude=exclude is not None)
    plan = dict(plan)
    plan["pairs_pos"] = pairs_pos
    return plan, aux


@pytest.mark.parametrize("exclude", [False, True])
def test_device_plan_matches_host_at_full_fanout(setup, exclude):
    g, csr, cfg, params, pu, pi, nu, ni, max_deg = setup
    caps = {"user": 64, "item": 64}
    fanout = max_deg  # deterministic: both planners take all neighbors
    ex = (pu, pi) if exclude else None
    host = _host_plan_tree(g, cfg, pu, pi, caps, fanout, ex)
    dev, aux = _device_plan_tree(g, cfg, pu, pi, caps, fanout, ex)
    assert not bool(aux["overflow"])

    out_h = sampled_forward(params, cfg, host, nu, ni)
    out_d = sampled_forward(params, cfg, dev, nu, ni)
    np.testing.assert_allclose(out_d["pred_ratings"],
                               out_h["pred_ratings"], rtol=1e-5,
                               atol=1e-5)
    # reconstruction heads agree row-for-row on VALID recon slots
    # (invalid slots resolve to frontier position 0, which names a
    # different node under each planner's frontier ordering — the loss
    # masks them by recon_ok, so only valid rows are comparable)
    for b in range(cfg.nblocks):
        for t in ("user", "item"):
            ok_d = np.asarray(out_d["recon_ok"][b][t])
            ok_h = np.asarray(out_h["recon_ok"][b][t])
            np.testing.assert_array_equal(ok_d, ok_h)
            sel = ok_h > 0
            assert sel.any()
            np.testing.assert_allclose(
                np.asarray(out_d["pred_embed"][b][t])[sel],
                np.asarray(out_h["pred_embed"][b][t])[sel],
                rtol=1e-5, atol=1e-5)


def test_device_plan_grads_match_host_at_full_fanout(setup):
    g, csr, cfg, params, pu, pi, nu, ni, max_deg = setup
    caps = {"user": 64, "item": 64}
    host = _host_plan_tree(g, cfg, pu, pi, caps, max_deg, (pu, pi))
    dev, _ = _device_plan_tree(g, cfg, pu, pi, caps, max_deg, (pu, pi))

    def loss(p, plan):
        out = sampled_forward(p, cfg, plan, nu, ni)
        return jnp.sum(out["pred_ratings"] ** 2)

    gh = jax.grad(loss)(params, host)
    gd = jax.grad(loss)(params, dev)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=5e-5, atol=5e-5), gh, gd)


@pytest.mark.parametrize("excl_mode", ["slot", "ranktab"])
def test_device_plan_matches_host_in_dedup_regime(excl_mode,
                                                  monkeypatch):
    """cap < n exercises the capped-unique + position-map machinery
    (the dense-frontier identity path is bypassed); at full fanout the
    device plan must still match the host plan exactly — under BOTH
    dedup-regime exclusion formulations (slot-space one-hot, and the
    any-scale rank-table fallback forced by zeroing its budget)."""
    from stargcn_tpu.graph import device_sampling as ds
    from stargcn_tpu.graph.device import BipartiteGraphData
    from stargcn_tpu.models import STARGCN, STARGCNConfig

    if excl_mode == "ranktab":
        monkeypatch.setattr(ds, "EXCLUDE_SLOT_ONEHOT_MAX_ELEMS", 0)

    g = synthetic_graph(num_users=200, num_items=150, num_edges=600,
                        rating_values=(1, 2, 3), seed=9)
    csr = g["user", "movie"]
    cfg = STARGCNConfig(
        num_users=200, num_items=150, num_links=3, nblocks=2,
        embed_units=8, agg_units=(12,), out_units=(10,),
        gcn_dropout=0.0, gen_rating_mid_map=6, agg_accum="sum")
    gd = BipartiteGraphData.from_csr(csr, pad_multiple=64)
    rng = np.random.RandomState(1)
    pu = rng.randint(0, 200, 8).astype(np.int32)
    pi = rng.randint(0, 150, 8).astype(np.int32)
    nu = np.arange(200, dtype=np.int32)
    ni = np.arange(150, dtype=np.int32)
    params = STARGCN(cfg).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, jnp.asarray(nu), jnp.asarray(ni),
        jnp.asarray(pu), jnp.asarray(pi), train=False)["params"]
    max_deg = int(max(np.diff(csr.ind_ptr).max(),
                      np.diff(csr.T.ind_ptr).max()))
    caps = {"user": 192, "item": 144}  # < n on both types
    host = _host_plan_tree(g, cfg, pu, pi, caps, max_deg, (pu, pi))
    dev, aux = _device_plan_tree(g, cfg, pu, pi, caps, max_deg, (pu, pi))
    assert not bool(aux["overflow"])
    assert 0 < int(aux["needed_user"]) <= 192  # dedup path really ran
    out_h = sampled_forward(params, cfg, host, nu, ni)
    out_d = sampled_forward(params, cfg, dev, nu, ni)
    np.testing.assert_allclose(out_d["pred_ratings"],
                               out_h["pred_ratings"], rtol=1e-5,
                               atol=1e-5)


def test_planner_handles_beyond_int32_id_product():
    """n_user * n_item > 2^31 must build fine WITH exclusion: the
    round-4 formulation packed row*n_item+col into int32 edge keys and
    asserted the product fit; the lex-sorted two-key formulation has no
    such limit (the beyond-HBM regime, 500k x 50k = 2.5e10)."""
    nu, ni = 60_000, 50_000
    assert nu * ni > 2 ** 31
    rng = np.random.RandomState(0)
    g = synthetic_graph(num_users=nu, num_items=ni, num_edges=5000,
                        rating_values=(1, 2, 3), seed=3)
    from stargcn_tpu.models import STARGCNConfig
    cfg_small = STARGCNConfig(
        num_users=nu, num_items=ni, num_links=3, nblocks=1,
        embed_units=4, agg_units=(6,), out_units=(5,),
        gcn_dropout=0.0, gen_rating_mid_map=4, agg_accum="sum")
    tab = DeviceGraphTables.build(g, "user", "movie")
    caps = {"user": 512, "item": 512}  # << n: dedup regime
    planner = DevicePlanner(cfg_small, caps, 4,
                            symm=cfg_small.agg_norm_symm)
    B = 64
    pu = rng.randint(0, nu, B).astype(np.int32)
    pi = rng.randint(0, ni, B).astype(np.int32)
    bu = jnp.take(tab.id2ind["user"], jnp.asarray(pu))
    bi = jnp.take(tab.id2ind["item"], jnp.asarray(pi))
    args = (tab, jax.random.PRNGKey(0), bu, bi,
            jnp.ones(B, jnp.float32),
            jnp.full(4, -1, jnp.int32), jnp.full(4, -1, jnp.int32))
    plan, pairs_pos, aux = planner.build(*args, exclude=True)
    assert not bool(aux["overflow"])
    for chain_blocks in plan["blocks"]:
        for lvl in chain_blocks:
            for t in ("user", "item"):
                w = np.asarray(lvl[t]["weight"])
                assert np.isfinite(w).all() and (w >= 0).all()
    # exclusion really fired: same key without exclusion samples the
    # same slots, so the excluded plan must carry strictly LESS total
    # positive weight (most users here have degree 1, so their batch
    # edge is sampled with certainty and then masked)
    plan_no, _, _ = planner.build(*args, exclude=False)

    def total_w(p):
        return sum(float(np.asarray(lvl[t]["weight"]).sum())
                   for cb in p["blocks"] for lvl in cb
                   for t in ("user", "item"))

    assert total_w(plan) < total_w(plan_no)


def test_sampled_fanout_statistics(setup):
    """With a small fanout the device plan is stochastic but its block
    weights must only reference valid source slots and carry the exact
    support values of real edges."""
    g, csr, cfg, params, pu, pi, nu, ni, max_deg = setup
    caps = {"user": 64, "item": 64}
    dev, aux = _device_plan_tree(g, cfg, pu, pi, caps, 2, None)
    for b, chain_blocks in enumerate(dev["blocks"]):
        for lvl in chain_blocks:
            for t in ("user", "item"):
                w = np.asarray(lvl[t]["weight"])
                idx = np.asarray(lvl[t]["idx"])
                assert np.isfinite(w).all()
                assert (idx >= 0).all()
                n_src = caps["item" if t == "user" else "user"]
                assert (idx < cfg.num_links * n_src).all()


def test_overflow_flag_and_needed_counts(setup):
    g, csr, cfg, params, pu, pi, nu, ni, max_deg = setup
    small = {"user": 8, "item": 8}
    dev, aux = _device_plan_tree(g, cfg, pu, pi, small, max_deg, None)
    assert bool(aux["overflow"])
    assert int(aux["needed_user"]) > 8 or int(aux["needed_item"]) > 8
    # generous caps: no overflow, needed counts fit
    big = {"user": 128, "item": 128}
    _, aux2 = _device_plan_tree(g, cfg, pu, pi, big, max_deg, None)
    assert not bool(aux2["overflow"])
    assert int(aux2["needed_user"]) <= 128


def test_capped_unique_and_positions():
    x = jnp.array([5, 3, 5, 9, 9, 7, 3], jnp.int32)
    u, n = _capped_unique(x, 6, 9)  # 9 = node count = sentinel
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(u),
                                  [3, 5, 7, 9, 9, 9])
    pos, ok = _positions(u, 9, jnp.array([7, 3, 4], jnp.int32))
    np.testing.assert_array_equal(np.asarray(pos), [2, 0, 0])
    np.testing.assert_array_equal(np.asarray(ok), [1.0, 1.0, 0.0])
    # truncation: more uniques than cap
    u2, n2 = _capped_unique(x, 2, 99)
    assert int(n2) == 4
    np.testing.assert_array_equal(np.asarray(u2), [3, 5])


def _tiny_trainer(plan_device, **kw):
    from stargcn_tpu.models import STARGCNConfig
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer

    g = synthetic_graph(num_users=40, num_items=28, num_edges=420,
                        rating_values=(1, 2, 3), seed=4)
    csr = g["user", "movie"]
    pairs = csr.node_pair_ids
    rng = np.random.RandomState(0)
    perm = rng.permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:60]],
                      valid_node_pairs=pairs[:, perm[60:120]],
                      embed_P_mask=0.2, seed=0,
                      embed_p_zero=1.0, embed_p_self=0.0)
    cfg = STARGCNConfig(
        num_users=40, num_items=28, num_links=3, nblocks=2,
        embed_units=8, agg_units=(12,), out_units=(10,),
        gcn_dropout=0.1, gen_rating_mid_map=6, agg_accum="sum")
    s = TrainSettings(rating_batch_size=32, recon_batch_size=16,
                      max_iter=16, log_interval=4, valid_interval=8,
                      lr=1e-2, seed=3, remove_rating=True)
    return SampledTrainer(cfg, it, s, fanout=3,
                          plan_device=plan_device, **kw)


def test_trainer_device_plan_fit(tmp_path):
    tr = _tiny_trainer(True, save_dir=str(tmp_path))
    res = tr.fit(max_iter=16)
    assert np.isfinite(res["best_valid_rmse"])
    # stats carry overflow accounting fields
    rs = tr.data_iter.rating_sampler(batch_size=tr.train_batch,
                                     segment="train")
    recon = tr.data_iter.recon_nodes_sampler(batch_size=16)
    stats = tr.train_iteration(tr._make_batch(rs, recon))
    assert "overflow" in stats and np.isfinite(float(stats["loss"]))


def test_trainer_device_plan_overflow_rejects_update():
    tr = _tiny_trainer(True)
    tr.caps = {"user": 8, "item": 8}  # force overflow
    rs = tr.data_iter.rating_sampler(batch_size=tr.train_batch,
                                     segment="train")
    recon = tr.data_iter.recon_nodes_sampler(batch_size=16)
    before = jax.device_get(tr.params)
    stats = tr.train_iteration(tr._make_batch(rs, recon))
    assert bool(stats["overflow"])
    assert float(stats["gnorm"]) == 0.0  # zeroed for logging sums
    after = jax.device_get(tr.params)
    jax.tree.map(np.testing.assert_array_equal, before, after)


def test_trainer_device_plan_chunk_matches_iterations():
    """train_chunk (scan-fused) executes the same updates as k
    train_iteration calls — device-planned twin of the host-mode
    test_sampled_train_chunk_matches_single_steps."""
    tra = _tiny_trainer(True)
    trb = _tiny_trainer(True)
    jax.tree.map(np.testing.assert_array_equal, tra.params, trb.params)
    rs_a = tra.data_iter.rating_sampler(batch_size=tra.train_batch,
                                        segment="train")
    rc_a = tra.data_iter.recon_nodes_sampler(batch_size=16)
    rs_b = trb.data_iter.rating_sampler(batch_size=trb.train_batch,
                                        segment="train")
    rc_b = trb.data_iter.recon_nodes_sampler(batch_size=16)
    batches_a = [tra._make_batch(rs_a, rc_a) for _ in range(3)]
    batches_b = [trb._make_batch(rs_b, rc_b) for _ in range(3)]
    for a, b in zip(batches_a, batches_b):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    for b in batches_a:
        tra.train_iteration(b)
    trb.train_chunk(batches_b)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        x, y, rtol=1e-6, atol=1e-6), jax.device_get(tra.params),
        jax.device_get(trb.params))


def test_trainer_device_plan_on_mesh_matches_single_device():
    """plan_device composes with mesh mode: the DP-sharded feed +
    row-sharding constraints around the in-jit planner produce the SAME
    update as the single-device program (same batch, same RNG seed)."""
    from stargcn_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tr_m = _tiny_trainer(True, mesh=make_mesh(data=2, model=4))
    tr_s = _tiny_trainer(True)
    rs = tr_s.data_iter.rating_sampler(batch_size=tr_s.train_batch,
                                       segment="train")
    rc = tr_s.data_iter.recon_nodes_sampler(batch_size=16)
    batch = tr_s._make_batch(rs, rc)
    st_s = tr_s.train_iteration(dict(batch))
    st_m = tr_m.train_iteration(dict(batch))
    np.testing.assert_allclose(float(st_m["loss"]), float(st_s["loss"]),
                               rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        jax.device_get(tr_s.params), jax.device_get(tr_m.params))


def test_remat_forward_matches_default(setup):
    """remat=True (per-level jax.checkpoint — the beyond-HBM memory
    shape) must be numerically identical to the default forward, and
    its gradients must match (dropout off: the remat path re-keys
    dropout per level, so only the deterministic paths are exactly
    comparable)."""
    g, csr, cfg, params, pu, pi, nu, ni, max_deg = setup
    caps = {"user": 24, "item": 20}  # dedup regime
    dev, _ = _device_plan_tree(g, cfg, pu, pi, caps, max_deg, (pu, pi))
    out_a = sampled_forward(params, cfg, dev, nu, ni)
    out_b = sampled_forward(params, cfg, dev, nu, ni, remat=True)
    np.testing.assert_array_equal(np.asarray(out_a["pred_ratings"]),
                                  np.asarray(out_b["pred_ratings"]))

    def loss(p, remat):
        out = sampled_forward(p, cfg, dev, nu, ni, remat=remat)
        return jnp.sum(out["pred_ratings"] ** 2)

    ga = jax.grad(loss)(params, False)
    gb = jax.grad(loss)(params, True)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-6, atol=1e-6), ga, gb)


def test_identity_frontier_shortcuts_match_gather_path(setup):
    """aux['identity'] (dense frontiers + iota ids) lets the forward
    read tables with an elementwise mask and pass cross-block features
    through — must equal the generic gather path exactly."""
    g, csr, cfg, params, pu, pi, nu, ni, max_deg = setup
    caps = {"user": 64, "item": 64}  # > n -> dense identity frontiers
    dev, aux = _device_plan_tree(g, cfg, pu, pi, caps, max_deg, None)
    assert aux["identity"] == {"user": True, "item": True}
    noise_u = np.asarray(nu).copy()
    noise_u[::3] = -1  # exercise the mask too
    out_g = sampled_forward(params, cfg, dev, noise_u, ni)
    out_i = sampled_forward(params, cfg, dev, noise_u, ni,
                            identity_frontiers=aux["identity"])
    np.testing.assert_allclose(np.asarray(out_i["pred_ratings"]),
                               np.asarray(out_g["pred_ratings"]),
                               rtol=1e-6, atol=1e-6)
    for b in range(cfg.nblocks):
        for t in ("user", "item"):
            np.testing.assert_allclose(
                np.asarray(out_i["pred_embed"][b][t]),
                np.asarray(out_g["pred_embed"][b][t]),
                rtol=1e-6, atol=1e-6)


def test_plan_split_matches_fused_step():
    """plan_split (two dispatches: plan program | update program — the
    beyond-HBM relay shape) must produce the SAME parameter update as
    the fused single-program step for identical batches and seed."""
    tra = _tiny_trainer(True)
    trb = _tiny_trainer(True, plan_split=True)
    jax.tree.map(np.testing.assert_array_equal, tra.params, trb.params)
    rs_a = tra.data_iter.rating_sampler(batch_size=tra.train_batch,
                                        segment="train")
    rc_a = tra.data_iter.recon_nodes_sampler(batch_size=16)
    rs_b = trb.data_iter.rating_sampler(batch_size=trb.train_batch,
                                        segment="train")
    rc_b = trb.data_iter.recon_nodes_sampler(batch_size=16)
    for _ in range(3):
        ba = tra._make_batch(rs_a, rc_a)
        bb = trb._make_batch(rs_b, rc_b)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])
        sa = tra.train_iteration(ba)
        sb = trb.train_iteration(bb)
        np.testing.assert_allclose(float(sa["loss"]), float(sb["loss"]),
                                   rtol=1e-6)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        x, y, rtol=1e-6, atol=1e-6), jax.device_get(tra.params),
        jax.device_get(trb.params))


def test_plan_split_on_mesh_matches_single_device():
    """plan_split composes with mesh mode: the DP-sharded feed through
    the two-program pair produces the same update as single-device."""
    from stargcn_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tr_m = _tiny_trainer(True, mesh=make_mesh(data=2, model=4),
                         plan_split=True)
    tr_s = _tiny_trainer(True, plan_split=True)
    rs = tr_s.data_iter.rating_sampler(batch_size=tr_s.train_batch,
                                       segment="train")
    rc = tr_s.data_iter.recon_nodes_sampler(batch_size=16)
    batch = tr_s._make_batch(rs, rc)
    st_s = tr_s.train_iteration(dict(batch))
    st_m = tr_m.train_iteration(dict(batch))
    np.testing.assert_allclose(float(st_m["loss"]), float(st_s["loss"]),
                               rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        jax.device_get(tr_s.params), jax.device_get(tr_m.params))


def test_sampled_bfloat16_compute_dtype(setup):
    """MODEL.COMPUTE_DTYPE on the SAMPLED path: bf16 encoder operands
    with f32 accumulation track the f32 forward within bf16 tolerance
    and emit f32 predictions (the full-graph module's mixed-precision
    contract, round-4; extended to sampled_forward in round 5)."""
    g, csr, cfg, params, pu, pi, nu, ni, max_deg = setup
    caps = {"user": 64, "item": 64}
    dev, _ = _device_plan_tree(g, cfg, pu, pi, caps, max_deg, (pu, pi))
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out32 = sampled_forward(params, cfg, dev, nu, ni)
    out16 = sampled_forward(params, cfg16, dev, nu, ni)
    assert out16["pred_ratings"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16["pred_ratings"]),
                               np.asarray(out32["pred_ratings"]),
                               rtol=3e-2, atol=3e-2)
    for b in range(cfg.nblocks):
        for t in ("user", "item"):
            np.testing.assert_allclose(
                np.asarray(out16["pred_embed"][b][t]),
                np.asarray(out32["pred_embed"][b][t]),
                rtol=5e-2, atol=5e-2)
    # gradients stay f32
    def loss(p, c):
        o = sampled_forward(p, c, dev, nu, ni)
        return jnp.sum(o["pred_ratings"] ** 2)
    g16 = jax.grad(loss)(params, cfg16)
    for leaf in jax.tree_util.tree_leaves(g16):
        assert leaf.dtype == jnp.float32

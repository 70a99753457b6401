"""Model-level tests: shapes, masking semantics, and reference-equivalent
behaviors of the STARGCN module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.data import DataIterator
from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.graph.device import BipartiteGraphData
from stargcn_tpu.models import STARGCN, STARGCNConfig


@pytest.fixture(scope="module")
def small_setup():
    g = synthetic_graph(num_users=25, num_items=18, num_edges=200,
                        rating_values=(1, 2, 3), seed=0)
    csr = g["user", "movie"]
    gd = BipartiteGraphData.from_csr(csr, pad_multiple=64)
    cfg = STARGCNConfig(
        num_users=25, num_items=18, num_links=3, nblocks=2,
        embed_units=8, agg_units=(12,), out_units=(10,),
        gcn_dropout=0.3, gen_rating_mid_map=6, agg_accum="stack")
    model = STARGCN(cfg)
    B = 16
    rng = np.random.RandomState(0)
    pu = jnp.asarray(rng.randint(0, 25, B), jnp.int32)
    pi = jnp.asarray(rng.randint(0, 18, B), jnp.int32)
    noise_u = jnp.arange(25, dtype=jnp.int32)
    noise_i = jnp.arange(18, dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, noise_u, noise_i, pu, pi, train=False)["params"]
    return g, csr, gd, cfg, model, params, pu, pi, noise_u, noise_i


def test_forward_shapes(small_setup):
    _, _, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    out = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                      pu, pi, train=False)
    assert out["pred_ratings"].shape == (2, 16)
    assert len(out["pred_embed"]) == 2
    assert out["pred_embed"][0]["user"].shape == (25, 8)
    assert out["pred_embed"][0]["item"].shape == (18, 8)
    assert out["gt_embed"]["user"].shape == (25, 8)
    assert np.all(np.isfinite(out["pred_ratings"]))


def test_zero_mask_zeroes_embedding(small_setup):
    """noise == -1 must zero the input embedding (STAR-GCN.py:292-298)."""
    _, _, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    # all-masked vs identity: outputs must differ, and an all-masked input
    # with an empty graph must make user outputs independent of user ids.
    out_id = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                         pu, pi, train=False)
    out_masked = model.apply({"params": params}, gd, gd.edge_pad_mask,
                             -jnp.ones_like(nu), -jnp.ones_like(ni),
                             pu, pi, train=False)
    assert not np.allclose(out_id["pred_ratings"], out_masked["pred_ratings"])
    # With everything masked, all user input embeddings are identical
    # (zero), so any difference comes from graph structure only.


def test_noise_redirect(small_setup):
    """noise[i] = j makes node i use node j's embedding (general gather
    path, self_noise_only=False)."""
    _, _, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    cfg_g = STARGCNConfig(**{**cfg.__dict__, "self_noise_only": False})
    model_g = STARGCN(cfg_g)
    # Redirect every user to user 0 — user input features become identical.
    nu_same = jnp.zeros_like(nu)
    out = model_g.apply({"params": params}, gd, gd.edge_pad_mask, nu_same,
                        ni, pu, pi, train=False)
    assert np.all(np.isfinite(out["pred_ratings"]))
    # self-or-masked noise: mask path == gather path exactly
    nu_m = np.asarray(nu).copy()
    nu_m[::3] = -1
    want = model_g.apply({"params": params}, gd, gd.edge_pad_mask,
                         jnp.asarray(nu_m), ni, pu, pi, train=False)
    got = model.apply({"params": params}, gd, gd.edge_pad_mask,
                      jnp.asarray(nu_m), ni, pu, pi, train=False)
    np.testing.assert_allclose(got["pred_ratings"], want["pred_ratings"],
                               rtol=1e-6, atol=1e-6)


def test_edge_mask_changes_predictions(small_setup):
    _, csr, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    full = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                       pu, pi, train=False)
    half_mask = np.asarray(gd.edge_pad_mask).copy()
    real = np.nonzero(half_mask)[0]
    half_mask[real[::2]] = 0.0
    half = model.apply({"params": params}, gd, jnp.asarray(half_mask),
                       nu, ni, pu, pi, train=False)
    assert not np.allclose(full["pred_ratings"], half["pred_ratings"])


def test_empty_graph_is_finite(small_setup):
    """Zero-degree nodes must produce finite outputs (support = 0)."""
    _, _, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    out = model.apply({"params": params}, gd,
                      jnp.zeros_like(gd.edge_pad_mask), nu, ni, pu, pi,
                      train=False)
    assert np.all(np.isfinite(out["pred_ratings"]))
    assert np.all(np.isfinite(out["pred_embed"][0]["user"]))


def test_accum_sum_and_recurrent_variants():
    g = synthetic_graph(num_users=10, num_items=8, num_edges=60,
                        rating_values=(1, 2), seed=1)
    gd = BipartiteGraphData.from_csr(g["user", "movie"], pad_multiple=32)
    for accum in ("sum", "stack"):
        for use_rec in (False, True):
            cfg = STARGCNConfig(
                num_users=10, num_items=8, num_links=2, nblocks=2,
                use_recurrent=use_rec, embed_units=4, agg_units=(6,),
                out_units=(5,), agg_accum=accum, gen_rating_mid_map=4,
                agg_ordinal_sharing=True)
            model = STARGCN(cfg)
            pu = jnp.zeros(4, jnp.int32)
            pi = jnp.zeros(4, jnp.int32)
            nu = jnp.arange(10, dtype=jnp.int32)
            ni = jnp.arange(8, dtype=jnp.int32)
            params = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                gd, gd.edge_pad_mask, nu, ni, pu, pi, train=False)["params"]
            out = model.apply({"params": params}, gd, gd.edge_pad_mask,
                              nu, ni, pu, pi, train=False)
            assert out["pred_ratings"].shape == (2, 4)
            if use_rec:
                # recurrent: single encoder block parameter set
                enc_keys = [k for k in params if k.startswith("enc_b")]
                assert enc_keys == ["enc_b0"]


def test_two_layer_stack():
    """AGG.UNITS lists with L=2 build two GCN layers per block
    (reference zip(AGG.UNITS, OUT.UNITS), STAR-GCN.py:203)."""
    g = synthetic_graph(num_users=12, num_items=9, num_edges=70,
                        rating_values=(1, 2), seed=5)
    gd = BipartiteGraphData.from_csr(g["user", "movie"], pad_multiple=32)
    cfg = STARGCNConfig(
        num_users=12, num_items=9, num_links=2, nblocks=2,
        embed_units=4, agg_units=(8, 6), out_units=(7, 5),
        agg_accum="stack", gen_rating_mid_map=4)
    model = STARGCN(cfg)
    pu = jnp.zeros(4, jnp.int32); pi = jnp.zeros(4, jnp.int32)
    nu = jnp.arange(12, dtype=jnp.int32); ni = jnp.arange(9, dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, nu, ni, pu, pi, train=False)["params"]
    assert "l0" in params["enc_b0"] and "l1" in params["enc_b0"]
    # layer 1 consumes layer 0's out_units (7)
    assert params["enc_b0"]["l1"]["agg_user_item"]["weight"].shape == \
        (2, 7, 3)
    out = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                      pu, pi, train=False)
    assert np.all(np.isfinite(out["pred_ratings"]))


def test_gcn_recurrent_depth_sharing():
    """GCN.USE_RECURRENT shares ONE layer's weights across depth
    (layers.py:227-258)."""
    g = synthetic_graph(num_users=12, num_items=9, num_edges=70,
                        rating_values=(1, 2), seed=5)
    gd = BipartiteGraphData.from_csr(g["user", "movie"], pad_multiple=32)
    cfg = STARGCNConfig(
        num_users=12, num_items=9, num_links=2, nblocks=1,
        use_dae=False, embed_units=6, agg_units=(8, 8), out_units=(6, 6),
        gcn_use_recurrent=True, agg_accum="sum", gen_rating_mid_map=4)
    model = STARGCN(cfg)
    pu = jnp.zeros(4, jnp.int32); pi = jnp.zeros(4, jnp.int32)
    nu = jnp.arange(12, dtype=jnp.int32); ni = jnp.arange(9, dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, nu, ni, pu, pi, train=False)["params"]
    # single layer parameter set despite depth 2; input dim must equal
    # out dim for weight sharing to typecheck (6 -> 6)
    assert list(params["enc_b0"].keys()) == ["l0"]
    out = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                      pu, pi, train=False)
    assert np.all(np.isfinite(out["pred_ratings"]))


def test_param_count_structure(small_setup):
    """Per-rating weights: (R, D, U') with stack splitting units."""
    _, _, _, cfg, model, params, *_ = small_setup
    w = params["enc_b0"]["l0"]["agg_user_item"]["weight"]
    # 3 links, embed 8, stack: 12 units // 3 links = 4 per link
    assert w.shape == (3, 8, 4)
    b0_out = params["enc_b0"]["l0"]["out_fc_user"]["kernel"]
    assert b0_out.shape == (12, 10)


def test_dense_static_path_matches_xla(small_setup):
    """Static-adjacency MXU path (incl. removed-pairs correction) must
    reproduce the XLA gather/scatter numerics."""
    import jax.numpy as jnp

    from stargcn_tpu.ops.agg import build_dense_adjacency

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    cfg_d = STARGCNConfig(**{**cfg.__dict__, "backend": "dense"})
    model_d = STARGCN(cfg_d)
    adj = build_dense_adjacency(gd.edge_item, gd.edge_user, gd.edge_rating,
                                gd.edge_pad_mask, gd.num_links,
                                gd.num_users, gd.num_items,
                                dtype=jnp.float32)
    # remove 4 real edges + 1 invalid slot
    rem_u = jnp.asarray(np.asarray(gd.edge_user)[:4].tolist() + [0],
                        jnp.int32)
    rem_i = jnp.asarray(np.asarray(gd.edge_item)[:4].tolist() + [0],
                        jnp.int32)
    rem_v = jnp.asarray([1, 1, 1, 1, 0], jnp.float32)
    mask_removed = gd.edge_mask_from_pairs(rem_u, rem_i, rem_v,
                                           gd.edge_pad_mask)
    want = model.apply({"params": params}, gd, mask_removed, nu, ni,
                       pu, pi, train=False)
    got = model_d.apply({"params": params}, gd, mask_removed, nu, ni,
                        pu, pi, dense_adj=adj,
                        removed_pairs=(rem_u, rem_i, rem_v), train=False)
    np.testing.assert_allclose(got["pred_ratings"], want["pred_ratings"],
                               rtol=2e-4, atol=2e-4)
    # and with STATIC variant degrees + in-step correction (the
    # zero-O(E)-scatter training path)
    eu = np.asarray(gd.edge_user)
    ei = np.asarray(gd.edge_item)
    pm = np.asarray(gd.edge_pad_mask)
    du = np.zeros(gd.num_users, np.float32)
    di = np.zeros(gd.num_items, np.float32)
    np.add.at(du, eu, pm)
    np.add.at(di, ei, pm)
    got_s = model_d.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                          pu, pi, dense_adj=adj,
                          removed_pairs=(rem_u, rem_i, rem_v),
                          variant_degrees=(jnp.asarray(du),
                                           jnp.asarray(di)),
                          train=False)
    np.testing.assert_allclose(got_s["pred_ratings"], want["pred_ratings"],
                               rtol=2e-4, atol=2e-4)
    # and without removal
    want2 = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                        pu, pi, train=False)
    got2 = model_d.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                         pu, pi, dense_adj=adj, train=False)
    np.testing.assert_allclose(got2["pred_ratings"], want2["pred_ratings"],
                               rtol=2e-4, atol=2e-4)


def test_dense_static_bf16_adjacency_close(small_setup):
    """bf16 adjacency (the TPU default) stays within mixed-precision
    tolerance of the f32 path."""
    from stargcn_tpu.ops.agg import build_dense_adjacency

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    cfg_d = STARGCNConfig(**{**cfg.__dict__, "backend": "dense"})
    model_d = STARGCN(cfg_d)
    adj16 = build_dense_adjacency(gd.edge_item, gd.edge_user,
                                  gd.edge_rating, gd.edge_pad_mask,
                                  gd.num_links, gd.num_users, gd.num_items)
    assert adj16.dtype == jnp.bfloat16
    want = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                       pu, pi, train=False)
    got = model_d.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                        pu, pi, dense_adj=adj16, train=False)
    np.testing.assert_allclose(got["pred_ratings"], want["pred_ratings"],
                               rtol=3e-2, atol=3e-2)


def test_dense_static_asymmetric_support(small_setup):
    import jax.numpy as jnp

    from stargcn_tpu.ops.agg import build_dense_adjacency

    g, csr, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    cfg_a = STARGCNConfig(**{**cfg.__dict__, "agg_norm_symm": False})
    cfg_ad = STARGCNConfig(**{**cfg_a.__dict__, "backend": "dense"})
    m_x, m_d = STARGCN(cfg_a), STARGCN(cfg_ad)
    adj = build_dense_adjacency(gd.edge_item, gd.edge_user, gd.edge_rating,
                                gd.edge_pad_mask, gd.num_links,
                                gd.num_users, gd.num_items,
                                dtype=jnp.float32)
    want = m_x.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                     pu, pi, train=False)
    got = m_d.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                    pu, pi, dense_adj=adj, train=False)
    np.testing.assert_allclose(got["pred_ratings"], want["pred_ratings"],
                               rtol=2e-4, atol=2e-4)


def test_dense_backend_matches_xla(small_setup):
    g, csr, gd, cfg, model, params, pu, pi, nu, ni = small_setup
    out_xla = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                          pu, pi, train=False)
    cfg_d = STARGCNConfig(**{**cfg.__dict__, "backend": "dense"})
    model_d = STARGCN(cfg_d)
    out_dense = model_d.apply({"params": params}, gd, gd.edge_pad_mask,
                              nu, ni, pu, pi, train=False)
    np.testing.assert_allclose(out_xla["pred_ratings"],
                               out_dense["pred_ratings"], rtol=2e-4,
                               atol=2e-4)


def test_heter_layer_accum_self_and_layer_accum(rng):
    """accum_self adds a self-projection (layers.py:130-141); layer_accum
    stack/sum combine across relations."""
    from stargcn_tpu.models.layers import HeterGCNLayer, Relation

    n_u, n_i, R, E = 9, 7, 2, 30
    es = jnp.asarray(rng.randint(0, n_i, E), jnp.int32)
    ed = jnp.asarray(rng.randint(0, n_u, E), jnp.int32)
    er = jnp.asarray(rng.randint(0, R, E), jnp.int32)
    sup = jnp.asarray(rng.uniform(0.1, 1, E).astype(np.float32))
    rels = {
        ("user", "item"): Relation(es, ed, er, sup, num_links=R),
        ("item", "user"): Relation(ed, es, er, sup, num_links=R),
    }
    feats = {"user": jnp.asarray(rng.normal(size=(n_u, 5)).astype(np.float32)),
             "item": jnp.asarray(rng.normal(size=(n_i, 5)).astype(np.float32))}
    for layer_accum in ("stack", "sum"):
        # 'sum' requires the self-projection dim (out_units) to equal the
        # aggregator dim (agg_units) — same implicit constraint as the
        # reference's add_n over [agg_out, self_fc_out] (layers.py:180).
        agg_u = 6 if layer_accum == "stack" else 4
        layer = HeterGCNLayer(
            meta={"user": ["item"], "item": ["user"]},
            agg_units=agg_u, out_units=4, agg_accum="sum",
            accum_self=True, layer_accum=layer_accum,
            agg_act="leaky", out_act="leaky")
        params = layer.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            feats, rels, train=False)["params"]
        assert "self_fc_user" in params  # self projection exists
        out = layer.apply({"params": params}, feats, rels, train=False)
        assert out["user"].shape == (n_u, 4)
        assert out["item"].shape == (n_i, 4)
        assert np.all(np.isfinite(out["user"]))


def test_gcn_aggregator_single_link(rng):
    """GCNAggregator == MultiLink with num_links=1 (aggregators.py:21-55)."""
    from stargcn_tpu.models.aggregators import GCNAggregator

    n_s, n_d, E = 8, 6, 20
    es = jnp.asarray(rng.randint(0, n_s, E), jnp.int32)
    ed = jnp.asarray(rng.randint(0, n_d, E), jnp.int32)
    sup = jnp.asarray(rng.uniform(0.1, 1, E).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n_s, 5)).astype(np.float32))
    agg = GCNAggregator(units=4, act="relu")
    params = agg.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      x, es, ed, sup, n_d, train=False)["params"]
    out = agg.apply({"params": params}, x, es, ed, sup, n_d, train=False)
    assert out.shape == (n_d, 4)
    assert np.all(out >= 0)  # relu


def test_bfloat16_compute_dtype(small_setup):
    """Mixed precision (MODEL.COMPUTE_DTYPE): bf16 compute with f32
    params tracks the f32 forward within bf16 tolerance, emits f32
    predictions, and keeps f32 parameter gradients."""
    import dataclasses

    g, csr, gd, cfg0, model0, params, pu, pi, nu, ni = small_setup
    cfg = dataclasses.replace(cfg0, compute_dtype="bfloat16")
    model = STARGCN(cfg)
    f32 = model0.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                       pu, pi, train=False)
    b16 = model.apply({"params": params}, gd, gd.edge_pad_mask, nu, ni,
                      pu, pi, train=False)
    assert b16["pred_ratings"].dtype == jnp.float32
    scale = float(np.abs(np.asarray(f32["pred_ratings"])).max())
    np.testing.assert_allclose(np.asarray(b16["pred_ratings"]),
                               np.asarray(f32["pred_ratings"]),
                               atol=0.05 * max(scale, 1.0))

    def loss(p):
        out = model.apply({"params": p}, gd, gd.edge_pad_mask, nu, ni,
                          pu, pi, train=False)
        return jnp.sum(out["pred_ratings"] ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(g.dtype == jnp.float32 for g in flat)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)

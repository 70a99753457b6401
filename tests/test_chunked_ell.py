"""Chunked-ELL backend: packing, pooled op + custom vjp, aggregator
equivalence, and Trainer integration (the big-graph full-graph path —
``ops/chunked_ell.py``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.graph.device import BipartiteGraphData
from stargcn_tpu.models import STARGCN, STARGCNConfig
from stargcn_tpu.ops.chunked_ell import (
    build_chunked_ell,
    build_ell_pack,
    ell_pool_rated,
    ref_pool_rated,
)


def random_coo(rng, num_src, num_dst, E, R):
    src = rng.randint(0, num_src, E).astype(np.int32)
    dst = rng.randint(0, num_dst, E).astype(np.int32)
    rat = rng.randint(0, R, E).astype(np.int32)
    return src, dst, rat


def test_build_covers_all_edges(rng):
    num_src, num_dst, E, R, K = 17, 11, 150, 4, 8
    src, dst, rat = random_coo(rng, num_src, num_dst, E, R)
    ell = build_chunked_ell(src, dst, rat, num_src, num_dst, K=K)
    # every real edge appears exactly once, on a row of its destination
    real = ell.src_idx < num_src
    assert int(real.sum()) == E
    rows, slots = np.nonzero(real)
    got = sorted(zip(ell.row_dst[rows].tolist(),
                     ell.src_idx[rows, slots].tolist(),
                     ell.rating[rows, slots].tolist()))
    want = sorted(zip(dst.tolist(), src.tolist(), rat.tolist()))
    assert got == want
    # rows sorted by destination
    assert np.all(np.diff(ell.row_dst[ell.row_dst >= 0]) >= 0)


@pytest.mark.parametrize("chunk", [None, 4])
def test_pool_rated_matches_golden(rng, chunk):
    num_src, num_dst, E, R, K, F = 23, 13, 220, 3, 8, 5
    src, dst, rat = random_coo(rng, num_src, num_dst, E, R)
    ell = build_chunked_ell(src, dst, rat, num_src, num_dst, K=K)
    x = rng.randn(num_src, F).astype(np.float32)
    x_pad = jnp.concatenate([jnp.asarray(x), jnp.zeros((1, F))], axis=0)
    out = ell_pool_rated(x_pad, jnp.asarray(ell.src_idx),
                         jnp.asarray(ell.rating), jnp.asarray(ell.row_dst),
                         jnp.asarray(ell.src_idx),  # bwd arrays unused fwd
                         jnp.asarray(ell.rating), jnp.asarray(ell.row_dst),
                         num_dst, num_src, R, chunk)
    np.testing.assert_allclose(np.asarray(out), ref_pool_rated(x, ell, R),
                               rtol=1e-5, atol=1e-5)


def test_pool_rated_grad_matches_autodiff_of_golden_formulation(rng):
    """The custom vjp (transpose-ELL routing) must equal autodiff of the
    straightforward gather/scatter formulation."""
    num_users, num_items, E, R, K, F = 12, 9, 80, 3, 4, 6
    eu = rng.randint(0, num_users, E).astype(np.int32)
    ei = rng.randint(0, num_items, E).astype(np.int32)
    er = rng.randint(0, R, E).astype(np.int32)
    # direction: dst = user, src = item; transpose arrays = item rows
    f_ell = build_chunked_ell(ei, eu, er, num_items, num_users, K=K)
    b_ell = build_chunked_ell(eu, ei, er, num_users, num_items, K=K)
    x = rng.randn(num_items, F).astype(np.float32)
    g = rng.randn(num_users, R, F).astype(np.float32)

    def via_ell(xx):
        x_pad = jnp.concatenate([xx, jnp.zeros((1, F))], axis=0)
        out = ell_pool_rated(
            x_pad, jnp.asarray(f_ell.src_idx), jnp.asarray(f_ell.rating),
            jnp.asarray(f_ell.row_dst), jnp.asarray(b_ell.src_idx),
            jnp.asarray(b_ell.rating), jnp.asarray(b_ell.row_dst),
            num_users, num_items, R, 4)
        return jnp.sum(out * g)

    def via_scatter(xx):
        msgs = jnp.take(xx, ei, axis=0)                    # (E, F)
        seg = eu * R + er
        out = jax.ops.segment_sum(msgs, seg,
                                  num_segments=num_users * R)
        return jnp.sum(out.reshape(num_users, R, F) * g)

    v1, g1 = jax.value_and_grad(via_ell)(jnp.asarray(x))
    v2, g2 = jax.value_and_grad(via_scatter)(jnp.asarray(x))
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("trial", range(3))
def test_model_ell_backend_matches_xla(trial):
    """Full model forward on the ell backend == the xla reference path,
    including removed-pairs correction (REMOVE_RATING semantics)."""
    rng = np.random.RandomState(42 + trial)
    nu_n, ni_n = int(rng.randint(8, 24)), int(rng.randint(8, 24))
    R = int(rng.choice([2, 3, 5]))
    E = int(rng.randint(40, 160))
    accum = ["stack", "sum"][trial % 2]
    symm = bool(trial % 2)
    units = 6 * R if accum == "stack" else 7

    g = synthetic_graph(num_users=nu_n, num_items=ni_n, num_edges=E,
                        rating_values=tuple(range(1, R + 1)),
                        seed=300 + trial)
    gd = BipartiteGraphData.from_csr(g["user", "movie"], pad_multiple=32)
    cfg = STARGCNConfig(
        num_users=nu_n, num_items=ni_n, num_links=R, nblocks=2,
        use_dae=True, embed_units=4, agg_units=(units,), out_units=(5,),
        agg_accum=accum, agg_norm_symm=symm,
        agg_ordinal_sharing=bool(trial == 1),
        gcn_dropout=0.0, gen_rating_mid_map=4)
    B = 8
    pu = jnp.asarray(rng.randint(0, nu_n, B), jnp.int32)
    pi = jnp.asarray(rng.randint(0, ni_n, B), jnp.int32)
    nu_j = jnp.arange(nu_n, dtype=jnp.int32)
    ni_j = jnp.arange(ni_n, dtype=jnp.int32)

    model = STARGCN(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(trial),
         "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi, train=False)["params"]
    ref = model.apply({"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j,
                      pu, pi, train=False)["pred_ratings"]

    cfg_e = dataclasses.replace(cfg, backend="ell", ell_k=8, ell_chunk=4)
    pack = build_ell_pack(gd.edge_user, gd.edge_item, gd.edge_rating,
                          gd.edge_pad_mask, nu_n, ni_n, K=8)
    du = jax.ops.segment_sum(gd.edge_pad_mask, gd.edge_user,
                             num_segments=nu_n)
    di = jax.ops.segment_sum(gd.edge_pad_mask, gd.edge_item,
                             num_segments=ni_n)
    got = STARGCN(cfg_e).apply(
        {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
        ell_pack=pack, variant_degrees=(du, di),
        train=False)["pred_ratings"]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    # removed-pairs (REMOVE_RATING) parity: mask edges on the xla side,
    # rank-B correction on the ell side
    hit_ref = model.apply(
        {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
        removed_pairs=(pu, pi, jnp.ones(B)), train=False)["pred_ratings"]
    # note: xla path masks edges via removed_pairs only inside Trainer;
    # emulate by building the removal mask directly
    mask = gd.edge_mask_from_pairs(pu, pi, jnp.ones(B), gd.edge_pad_mask)
    hit_ref = model.apply(
        {"params": params}, gd, mask, nu_j, ni_j, pu, pi,
        train=False)["pred_ratings"]
    # ell path: same removal via (pu, pi, hit, rating) correction
    eu = np.asarray(gd.edge_user)
    ei = np.asarray(gd.edge_item)
    keys = eu.astype(np.int64) * ni_n + ei
    order = np.argsort(keys, kind="stable")
    q = np.asarray(pu).astype(np.int64) * ni_n + np.asarray(pi)
    pos = np.searchsorted(keys[order], q)
    pos = np.clip(pos, 0, keys.size - 1)
    pad_np = np.asarray(gd.edge_pad_mask)
    hit = ((keys[order][pos] == q)
           & (pad_np[order][pos] > 0)).astype(np.float32)
    rating = np.asarray(gd.edge_rating)[order][pos].astype(np.int32)
    du2 = jax.ops.segment_sum(mask * gd.edge_pad_mask, gd.edge_user,
                              num_segments=nu_n)
    di2 = jax.ops.segment_sum(mask * gd.edge_pad_mask, gd.edge_item,
                              num_segments=ni_n)
    got_rm = STARGCN(cfg_e).apply(
        {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
        ell_pack=pack, variant_degrees=(du2, di2),
        removed_pairs=(pu, pi, jnp.asarray(hit), jnp.asarray(rating)),
        train=False)["pred_ratings"]
    np.testing.assert_allclose(got_rm, hit_ref, rtol=3e-4, atol=3e-4)


def test_trainer_ell_backend_end_to_end(tmp_path):
    """Trainer.fit with backend='ell' trains and evaluates."""
    from stargcn_tpu.data.iterators import DataIterator
    from stargcn_tpu.train.loop import Trainer, TrainSettings

    g = synthetic_graph(num_users=20, num_items=15, num_edges=200, seed=7)
    csr = g["user", "movie"]
    pairs = csr.node_pair_ids
    rng = np.random.RandomState(0)
    perm = rng.permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:30]],
                      valid_node_pairs=pairs[:, perm[30:60]],
                      embed_P_mask=0.2, seed=0,
                      embed_p_zero=1.0, embed_p_self=0.0)
    cfg = STARGCNConfig(
        num_users=20, num_items=15, num_links=len(csr.multi_link),
        nblocks=2, use_dae=True, embed_units=4, agg_units=(10,),
        out_units=(5,), agg_accum="sum", gcn_dropout=0.1,
        gen_rating_mid_map=4, backend="ell", ell_k=8, ell_chunk=None)
    s = TrainSettings(rating_batch_size=32, max_iter=6, log_interval=3,
                      valid_interval=3, lr=1e-2, seed=0)
    tr = Trainer(cfg, it, s, save_dir=str(tmp_path))
    result = tr.fit()
    assert np.isfinite(result["best_valid_rmse"])
    assert result["best_test_rmse"] is not None


def test_native_packer_matches_numpy():
    """The C++ O(E) counting packer (graph_kernels.cpp
    py_build_chunked_ell) must match the NumPy argsort packer
    bit-for-bit, including mask filtering and row/slot padding."""
    import stargcn_tpu.graph.kernels as km
    from stargcn_tpu.ops.chunked_ell import build_chunked_ell

    if km.native_module() is None or not hasattr(
            km.native_module(), "build_chunked_ell"):
        pytest.skip("native ext not built")
    rng = np.random.RandomState(7)
    for trial in range(20):
        E = rng.randint(1, 300)
        ns, nd = rng.randint(1, 25), rng.randint(1, 25)
        es = rng.randint(0, ns, E).astype(np.int32)
        ed = rng.randint(0, nd, E).astype(np.int32)
        er = rng.randint(0, 4, E).astype(np.int32)
        mask = ((rng.uniform(size=E) > 0.3).astype(np.float32)
                if trial % 2 else None)
        K = int(rng.choice([3, 8, 64]))
        a = build_chunked_ell(es, ed, er, ns, nd, K=K, mask=mask)
        saved = km._native
        km._native = None
        try:
            b = build_chunked_ell(es, ed, er, ns, nd, K=K, mask=mask)
        finally:
            km._native = saved
        np.testing.assert_array_equal(a.src_idx, b.src_idx)
        np.testing.assert_array_equal(a.rating, b.rating)
        np.testing.assert_array_equal(a.row_dst, b.row_dst)
        assert a.num_real_edges == b.num_real_edges

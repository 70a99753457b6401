"""Tests for the flat-edge multi-link aggregation (ops/agg.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.ops.agg import (
    build_dense_support,
    edge_support,
    masked_degrees,
    multi_link_aggregate,
    multi_link_project,
)


def make_edges(rng, num_src, num_dst, num_links, E):
    edge_src = rng.randint(0, num_src, size=E).astype(np.int32)
    edge_dst = rng.randint(0, num_dst, size=E).astype(np.int32)
    edge_rating = rng.randint(0, num_links, size=E).astype(np.int32)
    support = rng.uniform(0.1, 1.0, size=E).astype(np.float32)
    return edge_src, edge_dst, edge_rating, support


def npy_aggregate(proj, es, ed, er, sup, num_dst, accum):
    R, _, U = proj.shape
    pooled = np.zeros((num_dst, R, U), np.float32)
    for e in range(len(es)):
        pooled[ed[e], er[e]] += sup[e] * proj[er[e], es[e]]
    if accum == "stack":
        return pooled.reshape(num_dst, R * U)
    return pooled.sum(axis=1)


@pytest.mark.parametrize("accum", ["stack", "sum"])
@pytest.mark.parametrize("backend", ["xla", "dense"])
def test_multi_link_aggregate(rng, accum, backend):
    num_src, num_dst, R, E, U = 13, 9, 4, 60, 6
    es, ed, er, sup = make_edges(rng, num_src, num_dst, R, E)
    proj = rng.normal(size=(R, num_src, U)).astype(np.float32)
    want = npy_aggregate(proj, es, ed, er, sup, num_dst, accum)
    got = multi_link_aggregate(
        jnp.asarray(proj), jnp.asarray(es), jnp.asarray(ed), jnp.asarray(er),
        jnp.asarray(sup), num_dst, accum=accum, backend=backend)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_multi_link_project_ordinal(rng):
    x = rng.normal(size=(7, 5)).astype(np.float32)
    W = rng.normal(size=(3, 5, 4)).astype(np.float32)
    b = rng.normal(size=(3, 4)).astype(np.float32)
    got = multi_link_project(jnp.asarray(x), jnp.asarray(W), jnp.asarray(b),
                             ordinal_sharing=True)
    # ordinal sharing: W_r = sum_{j<=r} w_j (reference aggregators.py:133-140)
    for r in range(3):
        want = x @ W[: r + 1].sum(0) + b[: r + 1].sum(0)
        np.testing.assert_allclose(got[r], want, rtol=1e-4, atol=1e-4)


def test_masked_support_matches_reference_formula(rng):
    """support = 1/sqrt(d_src*d_dst) on the masked graph with TOTAL degrees
    (reference get_support, graph_sampler.cpp:393-420, computed before the
    per-rating multi_link_split)."""
    num_src, num_dst, R, E = 11, 8, 3, 50
    es, ed, er, _ = make_edges(rng, num_src, num_dst, R, E)
    mask = (rng.uniform(size=E) > 0.3).astype(np.float32)
    d_s, d_d = masked_degrees(jnp.asarray(es), jnp.asarray(ed),
                              jnp.asarray(mask), num_src, num_dst)
    sup = edge_support(d_s, d_d, jnp.asarray(es), jnp.asarray(ed),
                       jnp.asarray(mask), symm=True)

    deg_s = np.zeros(num_src); deg_d = np.zeros(num_dst)
    for e in range(E):
        deg_s[es[e]] += mask[e]
        deg_d[ed[e]] += mask[e]
    for e in range(E):
        if mask[e] and deg_s[es[e]] > 0 and deg_d[ed[e]] > 0:
            want = 1.0 / np.sqrt(deg_s[es[e]] * deg_d[ed[e]])
        else:
            want = 0.0
        np.testing.assert_allclose(sup[e], want, rtol=1e-5, atol=1e-6)

    sup_asym = edge_support(d_s, d_d, jnp.asarray(es), jnp.asarray(ed),
                            jnp.asarray(mask), symm=False)
    for e in range(E):
        want = mask[e] / deg_s[es[e]] if mask[e] and deg_s[es[e]] > 0 else 0.0
        np.testing.assert_allclose(sup_asym[e], want, rtol=1e-5, atol=1e-6)


def test_dense_support_scatter(rng):
    num_src, num_dst, R, E = 6, 5, 2, 20
    es, ed, er, sup = make_edges(rng, num_src, num_dst, R, E)
    S = build_dense_support(jnp.asarray(es), jnp.asarray(ed), jnp.asarray(er),
                            jnp.asarray(sup), R, num_dst, num_src)
    want = np.zeros((R, num_dst, num_src), np.float32)
    for e in range(E):
        want[er[e], ed[e], es[e]] += sup[e]
    np.testing.assert_allclose(S, want, rtol=1e-6, atol=1e-6)


def test_edge_chunked_xla_matches(rng):
    """Memory-bounded chunked aggregation == unchunked (fwd + grad)."""
    import jax

    R, NS, ND, E, U = 3, 17, 13, 200, 8
    es, ed, er, sup = make_edges(rng, NS, ND, R, E)
    proj = rng.normal(size=(R, NS, U)).astype(np.float32)
    args = (jnp.asarray(es), jnp.asarray(ed), jnp.asarray(er),
            jnp.asarray(sup))
    a = multi_link_aggregate(jnp.asarray(proj), *args, ND, accum="stack",
                             backend="xla")
    b = multi_link_aggregate(jnp.asarray(proj), *args, ND, accum="stack",
                             backend="xla", edge_chunk=64)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    ga = jax.grad(lambda p: multi_link_aggregate(
        p, *args, ND, accum="sum", backend="xla").sum())(jnp.asarray(proj))
    gb = jax.grad(lambda p: multi_link_aggregate(
        p, *args, ND, accum="sum", backend="xla",
        edge_chunk=64).sum())(jnp.asarray(proj))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("accum", ["stack", "sum"])
@pytest.mark.parametrize("ordinal", [False, True])
def test_per_edge_dropout_mode_matches_at_eval(rng, accum, ordinal):
    """DROPOUT_PER_EDGE (reference aggregators.py:131 granularity) is a
    different TRAIN-time distribution but must be EXACTLY the standard
    flat-edge path when dropout is inactive (eval / rate in effect 0)."""
    import jax
    from stargcn_tpu.models.aggregators import MultiLinkGCNAggregator

    num_src, num_dst, R, E, U = 11, 8, 3, 50, 6
    es, ed, er, sup = make_edges(rng, num_src, num_dst, R, E)
    x = jnp.asarray(rng.normal(size=(num_src, 5)).astype(np.float32))
    kw = dict(units=U * R if accum == "stack" else U, num_links=R,
              act="leaky", dropout_rate=0.4, ordinal_sharing=ordinal,
              accum=accum)
    base = MultiLinkGCNAggregator(**kw)
    per_edge = MultiLinkGCNAggregator(**kw, dropout_per_edge=True)
    args = (x, jnp.asarray(es), jnp.asarray(ed), jnp.asarray(er),
            jnp.asarray(sup))
    params = base.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       *args, num_dst, train=False)["params"]
    out_base = base.apply({"params": params}, *args, num_dst, train=False)
    out_pe = per_edge.apply({"params": params}, *args, num_dst,
                            train=False)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_pe),
                               rtol=1e-5, atol=1e-5)

    # train=True: masks are per GATHERED edge row — different draws give
    # different outputs, and repeat source gathers are dropped
    # independently (two edges from the same source need not share a
    # mask, unlike the per-source-node mode).
    o1 = per_edge.apply({"params": params}, *args, num_dst, train=True,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    o2 = per_edge.apply({"params": params}, *args, num_dst, train=True,
                        rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))

    # gradients flow through the per-edge branch
    def loss(p):
        return jnp.sum(per_edge.apply(
            {"params": p}, *args, num_dst, train=True,
            rngs={"dropout": jax.random.PRNGKey(4)}) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in flat)
    assert any(np.any(l != 0) for l in flat)


def test_dropout_per_edge_forces_xla_backend():
    """build_model_config must pin the flat-edge backend when the
    per-edge dropout parity mode is requested."""
    from stargcn_tpu.train.loop import build_model_config
    from stargcn_tpu.utils import default_cfg

    cfg = default_cfg()
    cfg.KERNEL.BACKEND = "dense"
    cfg.GCN.DROPOUT_PER_EDGE = True
    mc = build_model_config(cfg, 30, 20, 3, num_edges=100)
    assert mc.backend == "xla"
    assert mc.dropout_per_edge

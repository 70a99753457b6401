"""Cross-path consistency fuzz: for random small graphs and configs, the
four execution paths — XLA gather/scatter, edge-chunked XLA, static-dense
MXU, and the sampled two-phase forward (fanout = -1) — must all agree.

This is the broad regression guard for future kernel work: any new
backend optimisation must keep all paths on the same numbers.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.graph.device import BipartiteGraphData
from stargcn_tpu.models import STARGCN, STARGCNConfig
from stargcn_tpu.models.sampled import StackedPlan, sampled_forward
from stargcn_tpu.ops.agg import build_dense_adjacency


@pytest.mark.parametrize("trial", range(4))
def test_all_paths_agree(trial):
    rng = np.random.RandomState(100 + trial)
    nu_n = int(rng.randint(8, 30))
    ni_n = int(rng.randint(8, 30))
    R = int(rng.choice([2, 3, 5]))
    E = int(rng.randint(40, 200))
    nb = int(rng.choice([1, 2]))
    accum = rng.choice(["stack", "sum"])
    symm = bool(rng.randint(2))
    units = int(rng.choice([6, 12])) * R if accum == "stack" else \
        int(rng.choice([7, 11]))

    g = synthetic_graph(num_users=nu_n, num_items=ni_n, num_edges=E,
                        rating_values=tuple(range(1, R + 1)),
                        seed=200 + trial)
    csr = g["user", "movie"]
    gd = BipartiteGraphData.from_csr(csr, pad_multiple=32)
    cfg = STARGCNConfig(
        num_users=nu_n, num_items=ni_n, num_links=R, nblocks=nb,
        use_dae=nb > 1 or bool(rng.randint(2)),
        embed_units=int(rng.choice([4, 8])),
        agg_units=(units,), out_units=(int(rng.choice([5, 9])),),
        agg_accum=accum, agg_norm_symm=symm,
        agg_ordinal_sharing=bool(rng.randint(2)),
        gcn_dropout=0.0, gen_rating_mid_map=4)
    B = 8
    pu = jnp.asarray(rng.randint(0, nu_n, B), jnp.int32)
    pi = jnp.asarray(rng.randint(0, ni_n, B), jnp.int32)
    noise_u = np.arange(nu_n, dtype=np.int32)
    noise_u[rng.uniform(size=nu_n) < 0.2] = -1
    noise_i = np.arange(ni_n, dtype=np.int32)
    nu_j, ni_j = jnp.asarray(noise_u), jnp.asarray(noise_i)

    model = STARGCN(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(trial),
         "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi, train=False)["params"]

    ref = model.apply({"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j,
                      pu, pi, train=False)["pred_ratings"]

    # edge-chunked xla
    cfg_c = dataclasses.replace(cfg, edge_chunk=32)
    got_c = STARGCN(cfg_c).apply(
        {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
        train=False)["pred_ratings"]
    np.testing.assert_allclose(got_c, ref, rtol=2e-4, atol=2e-4)

    # static-dense MXU (f32 adjacency for exactness)
    cfg_d = dataclasses.replace(cfg, backend="dense")
    adj = build_dense_adjacency(gd.edge_item, gd.edge_user, gd.edge_rating,
                                gd.edge_pad_mask, R, nu_n, ni_n,
                                dtype=jnp.float32)
    got_d = STARGCN(cfg_d).apply(
        {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
        dense_adj=adj, train=False)["pred_ratings"]
    np.testing.assert_allclose(got_d, ref, rtol=2e-4, atol=2e-4)

    # chunked-ELL sparse path (the big-graph backend)
    from stargcn_tpu.ops.chunked_ell import build_ell_pack

    cfg_e = dataclasses.replace(cfg, backend="ell", ell_k=8, ell_chunk=8)
    pack = build_ell_pack(gd.edge_user, gd.edge_item, gd.edge_rating,
                          gd.edge_pad_mask, nu_n, ni_n, K=8)
    du = jax.ops.segment_sum(gd.edge_pad_mask, gd.edge_user,
                             num_segments=nu_n)
    di = jax.ops.segment_sum(gd.edge_pad_mask, gd.edge_item,
                             num_segments=ni_n)
    got_e = STARGCN(cfg_e).apply(
        {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
        ell_pack=pack, variant_degrees=(du, di),
        train=False)["pred_ratings"]
    np.testing.assert_allclose(got_e, ref, rtol=2e-4, atol=2e-4)

    # bit-packed dense MXU path (the other big-graph backend; xla impl
    # keeps the contraction in f32 for exact comparison)
    from stargcn_tpu.ops.bitdense import build_bit_pack

    cfg_b = dataclasses.replace(cfg, backend="bitdense", bit_impl="xla")
    bpack = build_bit_pack(gd.edge_user, gd.edge_item, gd.edge_rating,
                           gd.edge_pad_mask, nu_n, ni_n, R)
    got_b = STARGCN(cfg_b).apply(
        {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
        ell_pack=bpack, variant_degrees=(du, di),
        train=False)["pred_ratings"]
    np.testing.assert_allclose(got_b, ref, rtol=2e-4, atol=2e-4)

    # sampled two-phase, fanout = -1 (exact)
    plan = StackedPlan.build(g, cfg, np.asarray(pu), np.asarray(pi),
                             fanout=-1, node_pad=16)
    got_s = sampled_forward(params, cfg, plan, noise_u,
                            noise_i)["pred_ratings"]
    np.testing.assert_allclose(got_s, ref, rtol=5e-4, atol=5e-4)

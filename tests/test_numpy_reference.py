"""Golden-model test: a pure-NumPy STAR-GCN forward written directly from
the reference equations, compared against the flax model.

Covers the full semantic chain end to end: symmetric support on the
masked graph (graph_sampler.cpp:393-420), per-rating projection + support
-weighted pooling (aggregators.py:141-149), stack/sum accumulation
(aggregators.py:151-159), out-FC + leaky activations (layers.py:169-187),
embedding noise masking (STAR-GCN.py:264-300), per-block rating head
(STAR-GCN.py:428-438) and the embed_map chaining between blocks
(STAR-GCN.py:449-459).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.graph.device import BipartiteGraphData
from stargcn_tpu.models import STARGCN, STARGCNConfig


def leaky(x):
    return np.where(x > 0, x, 0.1 * x)


def numpy_stargcn_forward(params, cfg, edges, noise_u, noise_i, pu, pi):
    """From-equations forward (no dropout), edges = (eu, ei, er) arrays."""
    eu, ei, er = edges
    Nu, Ni, R = cfg.num_users, cfg.num_items, cfg.num_links

    # degrees + symmetric support (total degrees across ratings)
    du = np.zeros(Nu); di = np.zeros(Ni)
    for u, i in zip(eu, ei):
        du[u] += 1; di[i] += 1
    sup = np.array([1.0 / np.sqrt(du[u] * di[i]) for u, i in zip(eu, ei)])

    def p(*path):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node)

    # masked input embeddings (noise in {-1, self})
    feats = {}
    for key, noise, n in (("user", noise_u, Nu), ("item", noise_i, Ni)):
        table = p(f"embed_{key}", "embedding")
        keep = (noise != -1).astype(np.float32)[:, None]
        feats[key] = table * keep

    preds = []
    for b in range(cfg.nblocks):
        out = {}
        for t, s, e_dst, e_src in (("user", "item", eu, ei),
                                   ("item", "user", ei, eu)):
            W = p(f"enc_b{b}", "l0", f"agg_{t}_{s}", "weight")  # (R,D,U')
            bias = p(f"enc_b{b}", "l0", f"agg_{t}_{s}", "bias")
            n_dst = Nu if t == "user" else Ni
            U = W.shape[2]
            pooled = np.zeros((n_dst, R, U))
            for u_, i_, r_, s_ in zip(e_dst, e_src, er, sup):
                msg = feats[s][i_] @ W[r_] + bias[r_]
                pooled[u_, r_] += s_ * msg
            if cfg.agg_accum == "stack":
                agg = pooled.reshape(n_dst, R * U)
            else:
                agg = pooled.sum(axis=1)
            agg = leaky(agg)  # agg_act
            k = p(f"enc_b{b}", "l0", f"out_fc_{t}", "kernel")
            bb = p(f"enc_b{b}", "l0", f"out_fc_{t}", "bias")
            out[t] = leaky(agg @ k + bb)  # out_act
        # rating head
        uproj = out["user"][pu] @ p(f"rating_user_proj_b{b}", "kernel") \
            + p(f"rating_user_proj_b{b}", "bias")
        iproj = out["item"][pi] @ p(f"rating_item_proj_b{b}", "kernel") \
            + p(f"rating_item_proj_b{b}", "bias")
        preds.append((uproj * iproj).sum(axis=1))
        # next-block input via embed_map
        feats = {}
        for t in ("user", "item"):
            l0k = p(f"embed_map_b{b}_{t}_l0", "kernel")
            l0b = p(f"embed_map_b{b}_{t}_l0", "bias")
            l1k = p(f"embed_map_b{b}_{t}_l1", "kernel")
            l1b = p(f"embed_map_b{b}_{t}_l1", "bias")
            feats[t] = leaky(out[t] @ l0k + l0b) @ l1k + l1b
    return np.stack(preds)


@pytest.mark.parametrize("accum", ["stack", "sum"])
def test_model_matches_numpy_reference(accum):
    g = synthetic_graph(num_users=14, num_items=11, num_edges=80,
                        rating_values=(1, 2, 3), seed=7)
    csr = g["user", "movie"]
    gd = BipartiteGraphData.from_csr(csr, pad_multiple=32)
    cfg = STARGCNConfig(
        num_users=14, num_items=11, num_links=3, nblocks=2,
        embed_units=6, agg_units=(9,), out_units=(7,),
        gcn_dropout=0.0, gen_rating_mid_map=5, agg_accum=accum)
    model = STARGCN(cfg)
    rng = np.random.RandomState(2)
    pu = rng.randint(0, 14, 10).astype(np.int32)
    pi = rng.randint(0, 11, 10).astype(np.int32)
    noise_u = np.arange(14, dtype=np.int32)
    noise_u[3] = -1  # mask one user
    noise_i = np.arange(11, dtype=np.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        gd, gd.edge_pad_mask, jnp.asarray(noise_u), jnp.asarray(noise_i),
        jnp.asarray(pu), jnp.asarray(pi), train=False)["params"]

    got = model.apply({"params": params}, gd, gd.edge_pad_mask,
                      jnp.asarray(noise_u), jnp.asarray(noise_i),
                      jnp.asarray(pu), jnp.asarray(pi), train=False)

    real = np.asarray(gd.edge_pad_mask) > 0
    edges = (np.asarray(gd.edge_user)[real],
             np.asarray(gd.edge_item)[real],
             np.asarray(gd.edge_rating)[real])
    want = numpy_stargcn_forward(params, cfg, edges, noise_u, noise_i,
                                 pu, pi)
    np.testing.assert_allclose(np.asarray(got["pred_ratings"]), want,
                               rtol=5e-4, atol=5e-4)

"""Sampled mini-batch forward: the two-phase plan/execute path.

Functional re-implementation of the reference ``Net.forward``'s two-phase
structure (``experiments/STAR-GCN.py:372-460``: top-down host PLAN via
``gen_plan``, bottom-up device EXECUTE via ``heter_sage``) for graphs too
large for full-graph propagation.  The host phase
(``StackedPlan.build``) samples fixed-shape ELL frontier chains per
block; the device phase (``sampled_forward``) reuses the SAME parameter
pytree as the full-graph ``STARGCN`` module, so checkpoints are
interchangeable between modes.

With ``fanout = -1`` (all neighbors — every shipped reference config)
the sampled forward is numerically identical to the full-graph forward
on the target nodes (tested in ``tests/test_sampled.py``).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from stargcn_tpu.graph import kernels as K
from stargcn_tpu.graph.sampling import BlockSampler, SampledBlocks
from stargcn_tpu.models.common import get_activation
from stargcn_tpu.ops.agg import multi_link_project


@dataclasses.dataclass
class StackedPlan:
    """Per-block frontier chains, deepest block first (block 0)."""

    chains: List[SampledBlocks]
    pairs_pos: List[dict]    # per block: positions of rating-pair nodes
                             # in that block's top frontier

    @staticmethod
    def build(graph, cfg, pairs_user, pairs_item, fanout=-1,
              node_pad=128, name_user="user", name_item="movie",
              recon_user_ids=None, recon_item_ids=None, seed=None):
        """Top-down planning across blocks (``STAR-GCN.py:372-397``):
        block b's targets = rating-pair nodes (+ recon nodes) + the
        bottom frontier required by block b+1."""
        if seed is not None:
            K.set_seed(seed)
        L = len(cfg.agg_units)
        sampler = BlockSampler(graph, num_layers=L, fanout=fanout,
                               symm=cfg.agg_norm_symm, node_pad=node_pad,
                               name_user=name_user, name_item=name_item)
        base_u = np.unique(np.asarray(pairs_user, np.int32))
        base_i = np.unique(np.asarray(pairs_item, np.int32))
        if recon_user_ids is not None:
            base_u = np.union1d(base_u, np.asarray(recon_user_ids, np.int32))
        if recon_item_ids is not None:
            base_i = np.union1d(base_i, np.asarray(recon_item_ids, np.int32))

        chains = []
        tgt_u, tgt_i = base_u, base_i
        for _ in range(cfg.nblocks):
            blocks = sampler.sample(tgt_u, tgt_i)
            chains.append(blocks)
            # next (deeper) block must additionally produce this block's
            # level-0 frontier
            f0 = blocks.frontiers[0]
            tgt_u = np.union1d(base_u, f0["user"][f0["user"] >= 0])
            tgt_i = np.union1d(base_i, f0["item"][f0["item"] >= 0])
        chains = chains[::-1]  # block 0 = deepest chain

        pairs_pos = []
        pu = np.asarray(pairs_user, np.int32)
        pi = np.asarray(pairs_item, np.int32)
        for blocks in chains:
            top = blocks.frontiers[-1]
            pos_u = {int(v): i for i, v in enumerate(top["user"])}
            pos_i = {int(v): i for i, v in enumerate(top["item"])}
            pairs_pos.append({
                "user": np.asarray([pos_u[int(v)] for v in pu], np.int32),
                "item": np.asarray([pos_i[int(v)] for v in pi], np.int32),
            })
        return StackedPlan(chains=chains, pairs_pos=pairs_pos)


def _masked_embed_rows(table, ids, noise):
    """Gather embedding rows for frontier ids through the noise array
    (-1 / padded frontier slots -> zero rows)."""
    safe_ids = jnp.where(ids >= 0, ids, 0)
    redirected = jnp.take(noise, safe_ids)
    keep = (redirected != -1) & (ids >= 0)
    rows = jnp.take(table, jnp.where(keep, redirected, 0), axis=0)
    return rows * keep[:, None].astype(table.dtype)


def _ell_aggregate(proj, block, accum, use_pallas):
    """Pool per-rating projections over an ELL block.

    'sum' is one fused gather-pool; 'stack' gathers once and splits the
    per-slot messages across rating channels with a one-hot contraction
    (no per-rating re-gather).
    """
    R, n_src, units = proj.shape
    flat = proj.reshape(R * n_src, units)
    idx = block.rating * n_src + block.nbr_pos
    if accum == "sum":
        if use_pallas:
            from stargcn_tpu.ops.pallas_kernels import ell_spmm

            return ell_spmm(flat, idx, block.weight, False)
        return (jnp.take(flat, idx, axis=0)
                * block.weight[:, :, None]).sum(axis=1)
    # 'stack': msg[n,k,u] routed to channel block rating[n,k].
    msg = jnp.take(flat, idx, axis=0) * block.weight[:, :, None]  # N,K,U
    onehot = jax.nn.one_hot(block.rating, R, dtype=msg.dtype)     # N,K,R
    pooled = jnp.einsum("nku,nkr->nru", msg, onehot,
                        preferred_element_type=jnp.float32)
    n_dst = pooled.shape[0]
    return pooled.reshape(n_dst, R * units)


def sampled_forward(params, cfg, plan: StackedPlan, noise_user, noise_item,
                    backend: str = "xla"):
    """Bottom-up execution of the stacked plan (``STAR-GCN.py:399-460``).

    Deterministic (no dropout) — intended for evaluation/serving on
    graphs where full-graph propagation does not fit.  Reuses the
    full-graph parameter pytree.

    Returns {'pred_ratings': (nblocks, B), 'pred_embed': [...]} with the
    same semantics as ``STARGCN.__call__``.
    """
    act = get_activation(cfg.activation)
    use_pallas = backend == "pallas"
    table = {"user": params["embed_user"]["embedding"],
             "item": params["embed_item"]["embedding"]}
    noise = {"user": jnp.asarray(noise_user), "item": jnp.asarray(noise_item)}

    pred_ratings, pred_embed = [], []
    prev_top_feats = None
    for block_id, blocks in enumerate(plan.chains):
        pidx = 0 if cfg.use_recurrent else block_id
        enc = params[f"enc_b{pidx}"]
        f0 = blocks.frontiers[0]
        if block_id == 0:
            feats = {t: _masked_embed_rows(table[t],
                                           jnp.asarray(f0[t]), noise[t])
                     for t in ("user", "item")}
        else:
            # input = embed_map(previous block output) for this block's
            # level-0 frontier (gathered from the previous top frontier)
            prev_top = plan.chains[block_id - 1].frontiers[-1]
            feats = {}
            for t in ("user", "item"):
                pos = {int(v): i for i, v in enumerate(prev_top[t])}
                gather = np.asarray(
                    [pos.get(int(v), 0) for v in f0[t]], np.int32)
                ok = np.asarray([int(v) >= 0 and int(v) in pos
                                 for v in f0[t]], np.float32)
                feats[t] = (jnp.take(prev_top_feats[t],
                                     jnp.asarray(gather), axis=0)
                            * jnp.asarray(ok)[:, None])

        for li, lvl in enumerate(blocks.blocks):
            depth = 0 if cfg.gcn_use_recurrent else li
            layer = enc[f"l{depth}"]
            new_feats = {}
            for t, s in (("user", "item"), ("item", "user")):
                agg_p = layer[f"agg_{t}_{s}"]
                proj = multi_link_project(
                    feats[s], agg_p["weight"], agg_p["bias"],
                    ordinal_sharing=cfg.agg_ordinal_sharing)
                pooled = _ell_aggregate(proj, lvl[t], cfg.agg_accum,
                                        use_pallas)
                pooled = act(pooled)  # agg_act
                out_p = layer[f"out_fc_{t}"]
                h = pooled @ out_p["kernel"] + out_p["bias"]
                new_feats[t] = act(h)  # out_act
            feats = new_feats

        # rating head
        pp = plan.pairs_pos[block_id]
        u_rows = jnp.take(feats["user"], jnp.asarray(pp["user"]), axis=0)
        i_rows = jnp.take(feats["item"], jnp.asarray(pp["item"]), axis=0)
        up = params[f"rating_user_proj_b{pidx}"]
        ip = params[f"rating_item_proj_b{pidx}"]
        u_rows = u_rows @ up["kernel"] + up["bias"]
        i_rows = i_rows @ ip["kernel"] + ip["bias"]
        pred_ratings.append(jnp.sum(u_rows * i_rows, axis=-1))

        if cfg.use_dae:
            mapped = {}
            for t in ("user", "item"):
                l0 = params[f"embed_map_b{pidx}_{t}_l0"]
                l1 = params[f"embed_map_b{pidx}_{t}_l1"]
                h = act(feats[t] @ l0["kernel"] + l0["bias"])
                mapped[t] = h @ l1["kernel"] + l1["bias"]
            pred_embed.append(mapped)
            prev_top_feats = mapped

    return {"pred_ratings": jnp.stack(pred_ratings, axis=0),
            "pred_embed": pred_embed}

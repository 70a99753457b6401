"""Sampled mini-batch forward/training: the two-phase plan/execute path.

Functional re-implementation of the reference ``Net.forward``'s two-phase
structure (``experiments/STAR-GCN.py:372-460``: top-down host PLAN via
``gen_plan``, bottom-up device EXECUTE via ``heter_sage``) for graphs too
large for full-graph propagation.  The host phase (``StackedPlan.build``)
samples fixed-shape ELL frontier chains per block and precomputes every
cross-level index array, so the device phase (``sampled_forward``) is
pure array code — jittable, differentiable, and (with ``frontier_caps``)
single-program across batches.  It reuses the SAME parameter pytree as
the full-graph ``STARGCN`` module, so checkpoints are interchangeable.

With ``fanout = -1`` (all neighbors — every shipped reference config)
the sampled forward is numerically identical to the full-graph forward
on the target nodes (``tests/test_sampled.py``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stargcn_tpu.ops.gather import take_rows

from stargcn_tpu.graph import kernels as K
from stargcn_tpu.graph.sampling import BlockSampler, SampledBlocks
from stargcn_tpu.models.common import get_activation
from stargcn_tpu.ops.agg import multi_link_project


@dataclasses.dataclass
class StackedPlan:
    """Per-block frontier chains (block 0 = deepest) + index arrays.

    All members are numpy; convert with ``as_device()`` before feeding a
    jitted step.  ``cross_gather[b]`` maps block b's level-0 frontier
    into block b-1's top frontier (positions + validity).  ``recon_pos``
    locates the reconstruction target ids in each block's top frontier.
    """

    chains: List[SampledBlocks]
    pairs_pos: List[dict]
    cross_gather: List[Optional[dict]]
    recon_ids: dict
    recon_pos: List[dict]

    @staticmethod
    def build(graph, cfg, pairs_user, pairs_item, fanout=-1,
              node_pad=128, name_user="user", name_item="movie",
              recon_user_ids=None, recon_item_ids=None, seed=None,
              frontier_caps=None, sampler=None, exclude_pairs=None):
        """Top-down planning across blocks (``STAR-GCN.py:372-397``):
        block b's targets = rating-pair nodes (+ recon nodes) + the
        bottom frontier required by block b+1.

        Pass a prebuilt ``BlockSampler`` when planning repeatedly: its
        constructor precomputes support/rating arrays over ALL edges
        (seconds on a 10M-edge graph) while per-batch sampling is
        ~100x cheaper.

        ``exclude_pairs=(batch_user_ids, batch_item_ids)`` implements
        REMOVE_RATING (``STAR-GCN.py:595-600``): those edges are dropped
        from every sampled neighborhood and supports are recomputed from
        the removal-adjusted degrees — without them, each target pair's
        own rating leaks into the features predicting it.
        """
        if seed is not None:
            K.set_seed(seed)
        L = len(cfg.agg_units)
        if sampler is None:
            sampler = BlockSampler(
                graph, num_layers=L, fanout=fanout,
                symm=cfg.agg_norm_symm, node_pad=node_pad,
                name_user=name_user, name_item=name_item,
                frontier_caps=frontier_caps)
        exclude_keys = removal = None
        if exclude_pairs is not None:
            exclude_keys, removal = sampler.removal_args(*exclude_pairs)
        base_u = np.unique(np.asarray(pairs_user, np.int32))
        base_i = np.unique(np.asarray(pairs_item, np.int32))
        recon_ids = {
            "user": (np.asarray(recon_user_ids, np.int32)
                     if recon_user_ids is not None
                     else np.zeros(0, np.int32)),
            "item": (np.asarray(recon_item_ids, np.int32)
                     if recon_item_ids is not None
                     else np.zeros(0, np.int32)),
        }
        # -1 recon slots are padding (fixed-shape recon batches)
        base_u = np.union1d(base_u,
                            recon_ids["user"][recon_ids["user"] >= 0])
        base_i = np.union1d(base_i,
                            recon_ids["item"][recon_ids["item"] >= 0])

        chains = []
        tgt_u, tgt_i = base_u, base_i
        for _ in range(cfg.nblocks):
            blocks = sampler.sample(tgt_u, tgt_i,
                                    exclude_keys=exclude_keys,
                                    removal_counts=removal)
            chains.append(blocks)
            f0 = blocks.frontiers[0]
            tgt_u = np.union1d(base_u, f0["user"][f0["user"] >= 0])
            tgt_i = np.union1d(base_i, f0["item"][f0["item"] >= 0])
        chains = chains[::-1]  # block 0 = deepest chain

        def positions(top_ids, query_ids):
            """(pos, ok) of query_ids within top_ids (-1 slots -> ok=0)."""
            size = int(max(top_ids.max(initial=0),
                           query_ids.max(initial=0))) + 1
            pos_map = np.full(size + 1, -1, np.int32)
            valid_top = top_ids >= 0
            pos_map[top_ids[valid_top]] = np.nonzero(valid_top)[0]
            safe = np.where(query_ids >= 0, query_ids, size)
            pos = pos_map[np.minimum(safe, size)]
            ok = (pos >= 0) & (query_ids >= 0)
            return (np.where(ok, pos, 0).astype(np.int32),
                    ok.astype(np.float32))

        pu = np.asarray(pairs_user, np.int32)
        pi = np.asarray(pairs_item, np.int32)
        pairs_pos, cross_gather, recon_pos = [], [], []
        for b, blocks in enumerate(chains):
            top = blocks.frontiers[-1]
            pairs_pos.append({
                "user": positions(top["user"], pu)[0],
                "item": positions(top["item"], pi)[0],
            })
            recon_pos.append({
                t: positions(top[t], recon_ids[t]) for t in ("user", "item")
            })
            if b == 0:
                cross_gather.append(None)
            else:
                prev_top = chains[b - 1].frontiers[-1]
                f0 = blocks.frontiers[0]
                cross_gather.append({
                    t: positions(prev_top[t], f0[t])
                    for t in ("user", "item")})
        return StackedPlan(chains=chains, pairs_pos=pairs_pos,
                           cross_gather=cross_gather, recon_ids=recon_ids,
                           recon_pos=recon_pos)

    def as_host_tree(self):
        """The ``as_device()`` tree with NUMPY leaves (no transfers).

        Feed through :func:`pack_tree` to ship the whole plan to the
        device as two flat buffers: the plan is ~30 small arrays, and a
        per-array transfer pays the full host->device dispatch latency
        each time — the dominant cost of a sampled step on a remote
        runtime (measured: the packed path cut the ML-10M sampled step
        from ~310 ms to the device-bound floor)."""
        return {
            "frontiers": [
                {t: np.asarray(f[t]) for t in ("user", "item")}
                for c in self.chains for f in [c.frontiers[0]]],
            "blocks": [[{t: _blk_host(lvl[t],
                                      len(c.frontiers[li][_SRC_OF[t]]))
                         for t in ("user", "item")}
                        for li, lvl in enumerate(c.blocks)]
                       for c in self.chains],
            "pairs_pos": [{t: np.asarray(p[t]) for t in ("user", "item")}
                          for p in self.pairs_pos],
            "cross_gather": [
                None if cg is None else
                {t: (np.asarray(cg[t][0]), np.asarray(cg[t][1]))
                 for t in ("user", "item")}
                for cg in self.cross_gather],
            "recon_pos": [
                {t: (np.asarray(rp[t][0]), np.asarray(rp[t][1]))
                 for t in ("user", "item")}
                for rp in self.recon_pos],
            "recon_ids": {t: np.asarray(self.recon_ids[t])
                          for t in ("user", "item")},
        }

    def as_device(self):
        """Jittable pytree of the plan's arrays (shapes are static for a
        capped sampler, so one compiled step serves every batch)."""
        return {
            "frontiers": [
                {t: jnp.asarray(f[t]) for t in ("user", "item")}
                for c in self.chains for f in [c.frontiers[0]]],
            "blocks": [[{t: jax.tree_util.tree_map(
                             jnp.asarray,
                             _blk_host(lvl[t],
                                       len(c.frontiers[li][_SRC_OF[t]])))
                         for t in ("user", "item")}
                        for li, lvl in enumerate(c.blocks)]
                       for c in self.chains],
            "pairs_pos": [{t: jnp.asarray(p[t]) for t in ("user", "item")}
                          for p in self.pairs_pos],
            "cross_gather": [
                None if cg is None else
                {t: (jnp.asarray(cg[t][0]), jnp.asarray(cg[t][1]))
                 for t in ("user", "item")}
                for cg in self.cross_gather],
            "recon_pos": [
                {t: (jnp.asarray(rp[t][0]), jnp.asarray(rp[t][1]))
                 for t in ("user", "item")}
                for rp in self.recon_pos],
            "recon_ids": {t: jnp.asarray(self.recon_ids[t])
                          for t in ("user", "item")},
        }


_SRC_OF = {"user": "item", "item": "user"}


def _blk_host(b, n_src):
    """ELL block as shipped arrays: the per-slot rating level and source
    position fold into ONE combined index ``rating * n_src + nbr_pos``
    (what :func:`_ell_aggregate` indexes the (R*n_src, units) projection
    with) — halving the plan's int payload; the 'stack' accumulator
    recovers the rating as ``idx // n_src`` on device."""
    return {"idx": (np.asarray(b.rating) * np.int32(n_src)
                    + np.asarray(b.nbr_pos)).astype(np.int32),
            "weight": np.asarray(b.weight)}


def pack_tree(tree):
    """Flatten a numpy pytree into ``(int_buf, float_buf, spec)``.

    One int32 and one float32 buffer carry every leaf, so a jitted step
    taking the pair costs exactly TWO host->device transfers no matter
    how many arrays the plan holds.  ``spec`` is hashable (treedef +
    per-leaf (is_float, offset, shape)) — pass it as a static jit
    argument and rebuild the tree inside the trace with
    :func:`unpack_tree` (static slices: free for XLA)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    int_parts, flt_parts, metas = [], [], []
    io = fo = 0
    for leaf in leaves:
        a = np.asarray(leaf)
        if a.dtype == np.int64:
            a = a.astype(np.int32)
        if a.dtype == np.float32:
            metas.append((True, fo, a.shape))
            flt_parts.append(a.ravel())
            fo += a.size
        elif a.dtype == np.int32:
            metas.append((False, io, a.shape))
            int_parts.append(a.ravel())
            io += a.size
        else:
            raise TypeError(f"pack_tree: unsupported dtype {a.dtype}")
    ibuf = (np.concatenate(int_parts) if int_parts
            else np.zeros(0, np.int32))
    fbuf = (np.concatenate(flt_parts) if flt_parts
            else np.zeros(0, np.float32))
    return ibuf, fbuf, (treedef, tuple(metas))


def unpack_tree(int_buf, float_buf, spec):
    """Inverse of :func:`pack_tree`; call INSIDE jit."""
    treedef, metas = spec
    leaves = []
    for is_float, off, shape in metas:
        buf = float_buf if is_float else int_buf
        n = 1
        for d in shape:
            n *= d
        leaves.append(buf[off:off + n].reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _masked_embed_rows(table, ids, noise):
    """Gather embedding rows for frontier ids through the noise array
    (-1 / padded frontier slots -> zero rows)."""
    safe_ids = jnp.where(ids >= 0, ids, 0)
    redirected = jnp.take(noise, safe_ids)
    keep = (redirected != -1) & (ids >= 0)
    rows = jnp.take(table, jnp.where(keep, redirected, 0), axis=0)
    return rows * keep[:, None].astype(table.dtype)


def _fea_proj_rows(params, t, fea, ids, act):
    """Project raw feature rows for frontier ids through the shared
    2-layer feature MLP (reference ``STAR-GCN.py:182-191``).  Padded
    (-1) frontier slots produce zero rows.  Features are NOT
    noise-masked — parity with the full-graph module
    (``models/stargcn.py``: only the embedding path goes through
    ``_masked_embed``)."""
    rows = jnp.take(fea, jnp.maximum(ids, 0), axis=0)
    l0 = params[f"fea_map_{t}_l0"]
    l1 = params[f"fea_map_{t}_l1"]
    h = act(rows @ l0["kernel"] + l0["bias"])
    h = h @ l1["kernel"] + l1["bias"]
    return h * (ids >= 0)[:, None].astype(h.dtype)


def _constrain(x, sharding):
    """``with_sharding_constraint`` when a sharding is given (mesh
    mode), identity otherwise — lets one forward serve both paths."""
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def _ell_aggregate(proj, block, accum, use_pallas):
    """Pool per-rating projections over an ELL block.

    'sum' is one fused gather-pool; 'stack' gathers once and splits the
    per-slot messages across rating channels with a one-hot contraction
    (no per-rating re-gather).
    """
    R, n_src, units = proj.shape
    flat = proj.reshape(R * n_src, units)
    idx = block["idx"]  # rating * n_src + nbr_pos, combined on host
    w = block["weight"]
    if accum == "sum":
        if use_pallas:
            from stargcn_tpu.ops.pallas_kernels import ell_spmm

            return ell_spmm(flat, idx, w, False)
        return (jnp.take(flat, idx, axis=0) * w[:, :, None]).sum(axis=1)
    # 'stack': msg[n,k,u] routed to channel block rating[n,k].
    msg = jnp.take(flat, idx, axis=0) * w[:, :, None]              # N,K,U
    onehot = jax.nn.one_hot(idx // n_src, R, dtype=msg.dtype)      # N,K,R
    pooled = jnp.einsum("nku,nkr->nru", msg, onehot,
                        preferred_element_type=jnp.float32)
    n_dst = pooled.shape[0]
    return pooled.reshape(n_dst, R * units)


def _pool_then_project(x, weight, bias, block, accum, ordinal_sharing):
    """Aggregate RAW source rows per rating level, then project the
    pooled result — linear-equivalent to project-then-pool (projection
    and pooling are both linear: ``pool_r(xW_r + b_r) = pool_r(x)W_r +
    wsum_r b_r``), with the per-level intermediate shrunk from
    ``(R, n_src, agg_units)`` to ``(n_dst, R, embed)``.

    The same insight as the chunked-ELL/bitdense full-graph backends
    (move raw features, not projected ones); at beyond-HBM frontier
    sizes (260k-row frontiers, R=10, agg 250) the projected tensor is
    2.6 GB and OOMs where the raw pooled one is 190 MB.

    Mixed precision rides on ``x.dtype`` (MODEL.COMPUTE_DTYPE): the
    gathered messages, supports and projection operands compute in
    that dtype with f32 accumulation on every contraction (the same
    contract as the full-graph flax modules); params/bias stay f32.
    """
    if ordinal_sharing:
        weight = jnp.cumsum(weight, axis=0)
        bias = jnp.cumsum(bias, axis=0)
    R = weight.shape[0]
    n_src = x.shape[0]
    idx = block["idx"]          # rating * n_src + nbr_pos (combined)
    w = block["weight"].astype(x.dtype)  # (n_dst, K); 0 on padded slots
    msg = jnp.take(x, idx % n_src, axis=0) * w[:, :, None]       # N,K,E
    onehot = jax.nn.one_hot(idx // n_src, R, dtype=x.dtype)      # N,K,R
    raw = jnp.einsum("nke,nkr->nre", msg, onehot,
                     preferred_element_type=jnp.float32)
    wsum = jnp.einsum("nk,nkr->nr", w, onehot,
                      preferred_element_type=jnp.float32)
    if accum == "sum":
        out = jnp.einsum("nre,rea->na", raw.astype(x.dtype),
                         weight.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return out + wsum @ bias
    ch = jnp.einsum("nre,rea->nra", raw.astype(x.dtype),
                    weight.astype(x.dtype),
                    preferred_element_type=jnp.float32)
    ch = ch + wsum[:, :, None] * bias[None]
    return ch.reshape(ch.shape[0], -1)


def sampled_forward(params, cfg, plan, noise_user, noise_item,
                    backend: str = "xla", *, train: bool = False,
                    dropout_rng=None, features=None, row_sharding=None,
                    identity_frontiers=None, remat: bool = False):
    """Bottom-up execution of the stacked plan (``STAR-GCN.py:399-460``).

    ``plan`` may be a ``StackedPlan`` (converted on the fly) or the
    output of ``StackedPlan.as_device()`` (jit-friendly).  Dropout
    placement matches the reference (source features inside each
    aggregator, ``aggregators.py:131``; aggregated features before the
    out-FC, ``layers.py:169``).

    ``features`` = (user_features, item_features) raw feature matrices,
    required when ``cfg.use_fea_proj`` (reference ``STAR-GCN.py:182-191``:
    a shared 2-layer MLP projects them; rows are gathered per frontier
    here instead of projected full-table).

    ``row_sharding`` (mesh mode) constrains every frontier feature
    matrix to that sharding — P('data', None) row-shards the per-node
    compute across the data axis while GSPMD supplies the collective
    pulls from the 'model'-row-sharded embedding tables.

    Returns {'pred_ratings': (nblocks, B), 'pred_embed': per block per
    type (n_recon, emb) rows, 'recon_ok': per block per type validity,
    'gt_embed': (n_recon, emb) unmasked embedding rows}.
    """
    if isinstance(plan, StackedPlan):
        plan = plan.as_device()
    act = get_activation(cfg.activation)
    # MODEL.COMPUTE_DTYPE: encoder matmul operands in this dtype with
    # f32 accumulation; params, heads and predictions stay f32 (the
    # full-graph module's mixed-precision contract, models/stargcn.py)
    cdt = jnp.dtype(getattr(cfg, "compute_dtype", "float32"))
    use_pallas = backend == "pallas"
    if cfg.use_fea_proj and features is None:
        raise ValueError("cfg.use_fea_proj needs features=(user, item)")
    fea = ({"user": jnp.asarray(features[0]),
            "item": jnp.asarray(features[1])}
           if cfg.use_fea_proj else None)
    table = ({"user": params["embed_user"]["embedding"],
              "item": params["embed_item"]["embedding"]}
             if cfg.use_embed else None)
    noise = {"user": jnp.asarray(noise_user), "item": jnp.asarray(noise_item)}

    if train and dropout_rng is None:
        raise ValueError("train=True requires dropout_rng")
    rng_iter = [dropout_rng]

    def dropout(x):
        if not train or cfg.gcn_dropout == 0.0:
            return x
        rng_iter[0], sub = jax.random.split(rng_iter[0])
        keep = jax.random.bernoulli(sub, 1.0 - cfg.gcn_dropout, x.shape)
        return jnp.where(keep, x / (1.0 - cfg.gcn_dropout), 0.0)

    # identity_frontiers[t] (STATIC, device planner dense path): every
    # frontier of type t is the full node set in id order — embedding
    # reads become an elementwise row mask (no gather, no scatter
    # gradient; requires the self-noise invariant) and cross-block
    # features pass through directly.
    ident = identity_frontiers or {}

    def _is_ident(t):
        return bool(ident.get(t)) and cfg.self_noise_only

    nblocks = len(plan["blocks"])
    pred_ratings, pred_embed, recon_ok = [], [], []
    gt_embed = {}
    if cfg.use_embed:
        gt_embed = {
            t: jnp.take(table[t],
                        jnp.maximum(plan["recon_ids"][t], 0), axis=0)
            for t in ("user", "item")}
        if cfg.use_fea_proj and cfg.recon_fea:
            # gt = concat(embedding, projected features) rows at the
            # recon ids (full-graph module concatenates full-table).
            gt_embed = {
                t: jnp.concatenate(
                    [gt_embed[t],
                     _fea_proj_rows(params, t, fea[t],
                                    plan["recon_ids"][t], act)], axis=-1)
                for t in ("user", "item")}
    prev_top_feats = None
    for block_id in range(nblocks):
        pidx = 0 if cfg.use_recurrent else block_id
        enc = params[f"enc_b{pidx}"]
        f0 = plan["frontiers"][block_id]
        if block_id == 0:
            feats = {}
            for t in ("user", "item"):
                parts = []
                if cfg.use_embed:
                    if _is_ident(t):
                        keep = (noise[t] != -1)
                        parts.append(table[t]
                                     * keep[:, None].astype(table[t].dtype))
                    else:
                        parts.append(_masked_embed_rows(table[t], f0[t],
                                                        noise[t]))
                if cfg.use_fea_proj:
                    if _is_ident(t):
                        l0 = params[f"fea_map_{t}_l0"]
                        l1 = params[f"fea_map_{t}_l1"]
                        h = act(fea[t] @ l0["kernel"] + l0["bias"])
                        parts.append(h @ l1["kernel"] + l1["bias"])
                    else:
                        parts.append(_fea_proj_rows(params, t, fea[t],
                                                    f0[t], act))
                feats[t] = (parts[0] if len(parts) == 1
                            else jnp.concatenate(parts, axis=-1))
        else:
            cg = plan["cross_gather"][block_id]
            feats = {}
            for t in ("user", "item"):
                if _is_ident(t):
                    feats[t] = prev_top_feats[t]
                else:
                    pos, ok = cg[t]
                    feats[t] = (jnp.take(prev_top_feats[t], pos, axis=0)
                                * ok[:, None])
                if cfg.use_fea_proj and not cfg.recon_fea:
                    # next-block input = concat(mapped, fea_proj) —
                    # full-graph module (models/stargcn.py) /
                    # reference STAR-GCN.py:449-459 semantics.
                    feats[t] = jnp.concatenate(
                        [feats[t],
                         _fea_proj_rows(params, t, fea[t], f0[t], act)],
                        axis=-1)
        feats = {t: _constrain(v.astype(cdt), row_sharding)
                 for t, v in feats.items()}

        for li, lvl in enumerate(plan["blocks"][block_id]):
            depth = 0 if cfg.gcn_use_recurrent else li
            layer = enc[f"l{depth}"]

            def level_body(feats_u, feats_i, lvl=lvl, layer=layer,
                           drop=None):
                drop = dropout if drop is None else drop
                fin = {"user": feats_u, "item": feats_i}
                out = {}
                for t, s in (("user", "item"), ("item", "user")):
                    agg_p = layer[f"agg_{t}_{s}"]
                    if use_pallas:
                        # The Pallas ELL kernel pools pre-projected
                        # rows (the reference kernel's contract,
                        # seg_op.cu:573-790) — kept as-is for the
                        # head-to-head (f32: the hand kernels are
                        # f32); XLA default pools raw rows first.
                        proj = multi_link_project(
                            drop(fin[s]).astype(jnp.float32),
                            agg_p["weight"], agg_p["bias"],
                            ordinal_sharing=cfg.agg_ordinal_sharing)
                        pooled = _ell_aggregate(proj, lvl[t],
                                                cfg.agg_accum, True)
                    else:
                        pooled = _pool_then_project(
                            drop(fin[s]), agg_p["weight"],
                            agg_p["bias"], lvl[t], cfg.agg_accum,
                            cfg.agg_ordinal_sharing)
                    pooled = drop(act(pooled))  # agg_act then dropout
                    out_p = layer[f"out_fc_{t}"]
                    # out-FC in the compute dtype with f32 accumulation
                    h = jnp.einsum(
                        "na,ab->nb", pooled.astype(cdt),
                        out_p["kernel"].astype(cdt),
                        preferred_element_type=jnp.float32
                    ) + out_p["bias"]
                    # out_act; next level consumes the compute dtype
                    out[t] = _constrain(act(h).astype(cdt), row_sharding)
                return out["user"], out["item"]

            if remat:
                # Beyond-HBM memory shape: each level's (N, K, E)
                # message / (N, R, E) pooled residuals are the HBM
                # high-water mark at large frontiers (262k-row user
                # frontiers OOM a 16 GB chip with them saved); under
                # jax.checkpoint only the level's (N, E) boundary
                # features are saved and the inner tensors recompute
                # in the backward — the classic FLOPs-for-HBM trade.
                # Dropout keys are passed as operands so the
                # recomputation replays identical masks.
                if train and cfg.gcn_dropout > 0.0:
                    rng_iter[0], lkey = jax.random.split(rng_iter[0])
                else:
                    lkey = jax.random.PRNGKey(0)

                def level_remat(feats_u, feats_i, lkey, lvl=lvl,
                                layer=layer):
                    k = [lkey]

                    def drop(x):
                        if not train or cfg.gcn_dropout == 0.0:
                            return x
                        k[0], sub = jax.random.split(k[0])
                        keep = jax.random.bernoulli(
                            sub, 1.0 - cfg.gcn_dropout, x.shape)
                        return jnp.where(
                            keep, x / (1.0 - cfg.gcn_dropout), 0.0)

                    return level_body(feats_u, feats_i, lvl=lvl,
                                      layer=layer, drop=drop)

                fu, fi = jax.checkpoint(level_remat)(
                    feats["user"], feats["item"], lkey)
            else:
                fu, fi = level_body(feats["user"], feats["item"])
            feats = {"user": fu, "item": fi}

        # rating head (take_rows: scatter-free gradient — the plain
        # take's backward scatter-add serializes at ~5 us/row on this
        # TPU runtime; ops/gather.py)
        pp = plan["pairs_pos"][block_id]
        u_rows = take_rows(feats["user"], pp["user"])
        i_rows = take_rows(feats["item"], pp["item"])
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
            rp = plan["recon_pos"][block_id]
            pred_embed.append({
                t: take_rows(mapped[t], rp[t][0])
                for t in ("user", "item")})
            recon_ok.append({t: rp[t][1] for t in ("user", "item")})
            prev_top_feats = mapped

    return {"pred_ratings": jnp.stack(pred_ratings, axis=0),
            "pred_embed": pred_embed, "recon_ok": recon_ok,
            "gt_embed": gt_embed}


def sampled_loss(params, cfg, plan, noise_user, noise_item, gt_ratings,
                 pairs_valid, rating_mean, rating_std, recon_lambda,
                 *, train=False, dropout_rng=None, backend="xla",
                 features=None, row_sharding=None):
    """Rating + reconstruction loss on a sampled plan — the sampled-mode
    twin of the full-graph loss (``STAR-GCN.py:610-628``)."""
    out = sampled_forward(params, cfg, plan, noise_user, noise_item,
                          backend=backend, train=train,
                          dropout_rng=dropout_rng, features=features,
                          row_sharding=row_sharding)
    target = (gt_ratings - rating_mean) / rating_std
    n_valid = jnp.maximum(pairs_valid.sum(), 1.0)
    sq = (out["pred_ratings"] - target[None, :]) ** 2
    rating_loss = 0.5 * jnp.sum(sq * pairs_valid[None, :], axis=1) / n_valid
    loss = rating_loss.sum()
    recon_losses = []
    for blk, ok in zip(out["pred_embed"], out["recon_ok"]):
        block_loss = 0.0
        for t in ("user", "item"):
            diff = jnp.sum((blk[t] - out["gt_embed"][t]) ** 2, axis=-1)
            block_loss += (jnp.sum(diff * ok[t])
                           / jnp.maximum(ok[t].sum(), 1.0))
        recon_losses.append(block_loss)
    if recon_losses:
        loss = loss + recon_lambda * sum(recon_losses)
    return loss, (rating_loss, out["pred_ratings"])


def make_sampled_train_step(cfg, optimizer, rating_mean, rating_std,
                            recon_lambda, backend="xla"):
    """Jittable optimiser step over a device-plan — pair with a capped
    ``BlockSampler`` so every batch shares one compiled program."""

    @jax.jit
    def step(params, opt_state, plan, noise_user, noise_item, gt_ratings,
             pairs_valid, rng):
        (loss, (rating_loss, preds)), grads = jax.value_and_grad(
            sampled_loss, has_aux=True)(
                params, cfg, plan, noise_user, noise_item, gt_ratings,
                pairs_valid, rating_mean, rating_std, recon_lambda,
                train=True, dropout_rng=rng, backend=backend)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, {"loss": loss,
                                   "rating_loss": rating_loss,
                                   "preds": preds}

    return step

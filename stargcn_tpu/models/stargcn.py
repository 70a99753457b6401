"""STAR-GCN: stacked & reconstructed GCN for rating prediction (TPU mode).

Re-design of the reference ``Net`` (``experiments/STAR-GCN.py:167-461``)
as a single full-graph flax module.  The reference's forward is two-phase:
a host-side top-down PLAN over sampled subgraphs
(``STAR-GCN.py:372-397``) followed by a bottom-up device EXECUTE
(``STAR-GCN.py:399-460``).  Here there is no planning phase — every block
propagates over the whole (masked) graph in one jitted program, which is
mathematically identical to the reference when ``NUM_NEIGHBORS = -1``
(every shipped config, ``experiments/cfg/*.yml``) and removes the
reference's per-iteration host/C++/device round trips.

Masked-embedding semantics (``STAR-GCN.py:264-300``): input node ids come
from a full-size noise array where ``-1`` means "mask to zero embedding";
reconstruction targets are the unmasked embedding rows.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stargcn_tpu.graph.device import BipartiteGraphData
from stargcn_tpu.models.common import get_activation, uniform_sym, xavier_in
from stargcn_tpu.ops.gather import take_rows
from stargcn_tpu.models.layers import (
    InnerProductLayer,
    Relation,
    StackedHeterGCNLayers,
)
from stargcn_tpu.ops.agg import edge_support, masked_degrees


@dataclasses.dataclass(frozen=True)
class STARGCNConfig:
    """Model hyperparameters (mirrors the cfg tree of
    ``experiments/STAR-GCN.py:34-95``)."""

    num_users: int
    num_items: int
    num_links: int
    # MODEL.*
    use_embed: bool = True
    use_fea_proj: bool = False
    recon_fea: bool = False
    use_dae: bool = True
    nblocks: int = 2
    use_recurrent: bool = False  # share weights across blocks
    activation: str = "leaky"
    # FEA.*
    fea_mid_map: int = 16
    fea_units: int = 16
    # EMBED.*
    embed_units: int = 64
    # GCN.*
    gcn_dropout: float = 0.7
    gcn_use_recurrent: bool = False  # share weights across depth
    agg_norm_symm: bool = True
    agg_units: tuple = (500,)
    agg_accum: str = "stack"
    agg_ordinal_sharing: bool = False
    out_units: tuple = (75,)
    # GEN_RATING.*
    gen_rating_mid_map: int = 64
    # kernel backend for the aggregation
    # ('xla' | 'dense' | 'ell' | 'pallas')
    backend: str = "xla"
    # xla backend: edges processed in rematerialised chunks of this size
    # (bounds the (E, units) message buffer on big graphs); None = all
    edge_chunk: int | None = None
    # ell backend (ops/chunked_ell.py): virtual-row width K (host
    # packing), rematerialised row-chunk size (bounds the gather buffer)
    # and bf16 gather/contract toggle.
    ell_k: int = 64
    ell_chunk: int | None = 16384
    ell_bf16: bool = False
    # bitdense backend (ops/bitdense.py): kernel implementation
    # ('auto' = Pallas on TPU, XLA fallback elsewhere).
    bit_impl: str = "auto"
    # Reference-exact dropout granularity: independent mask per GATHERED
    # edge row (aggregators.py:131) instead of per source node.  Quality
    # A/B mode; forces the flat-edge backend (see build_model_config).
    dropout_per_edge: bool = False
    # Mixed precision: compute dtype for the encoder/decoder matmul path
    # ('float32' | 'bfloat16').  Parameters and the optimizer state stay
    # f32; activations and matmul operands run in this dtype with f32
    # MXU accumulation (preferred_element_type), and the loss heads cast
    # back to f32.  bf16 doubles the MXU rate and halves activation HBM
    # traffic — the production setting for throughput runs; RMSE-parity
    # experiments keep f32.
    compute_dtype: str = "float32"
    # Noise arrays only ever hold -1 (mask) or the node's own id in every
    # reference experiment (recon sampler: iterators.py:339-358; eval
    # noise: iterators.py:228-236), so the masked embed reduces to an
    # elementwise row mask — no gather, and crucially no sequential
    # scatter in the embedding gradient.  Set False to allow arbitrary
    # noise[i] = j redirects (gather path).
    self_noise_only: bool = True

    def __post_init__(self):
        assert self.use_embed or self.use_fea_proj
        if self.nblocks > 1:
            assert self.use_dae, "stacked blocks require the DAE structure"
        assert len(self.agg_units) == len(self.out_units)


class STARGCN(nn.Module):
    """The full network: embeddings -> [encoder -> heads -> decoder] x B.

    ``__call__`` inputs (all static-shape):
      graph: ``BipartiteGraphData`` edge arrays.
      edge_mask: ``(E_pad,)`` float — 1 for edges present in this step's
        graph (pad mask x graph-variant mask x per-batch removal).
      noise_user / noise_item: ``(N,)`` int32 full-size noise arrays
        (-1 = mask embedding to zero, else the node's own id); pass
        ``None`` for no masking.
      pairs_user / pairs_item: ``(B,)`` int32 rating-pair node indices.
      user_features / item_features: raw feature matrices (only read when
        ``use_fea_proj``).

    Returns a dict with ``pred_ratings`` ``(nblocks, B)`` (normalised
    scores), ``pred_embed`` (per block ``{'user','item'}`` full-graph
    reconstructed embeddings), and ``gt_embed`` (unmasked embedding
    tables, the reconstruction target — ``STAR-GCN.py:360-366``).
    """

    cfg: STARGCNConfig

    @nn.compact
    def __call__(self, graph: BipartiteGraphData, edge_mask, noise_user,
                 noise_item, pairs_user, pairs_item, user_features=None,
                 item_features=None, dense_adj=None, removed_pairs=None,
                 variant_degrees=None, ell_pack=None, *,
                 train: bool = False, return_rating_feats: bool = False):
        cfg = self.cfg
        act = get_activation(cfg.activation)

        use_ell = cfg.backend == "ell" and ell_pack is not None
        use_bit = cfg.backend == "bitdense" and ell_pack is not None
        use_static = ((cfg.backend == "dense" and dense_adj is not None)
                      or use_ell or use_bit)
        # Normalise removed_pairs: (pu, pi, valid) triggers an in-jit
        # binary-search edge lookup; (pu, pi, hit, rating) carries the
        # lookup result computed on the host (cheaper — the searchsorted
        # chain is sequential and slow on TPU).
        removed_info = None
        if removed_pairs is not None:
            if len(removed_pairs) == 4:
                removed_info = removed_pairs
            else:
                if not graph.has_pair_lookup:
                    raise ValueError(
                        "pair-key space exceeds int32: pass the "
                        "host-computed (pu, pi, hit, rating) tuple "
                        "instead of the 3-tuple in-jit lookup form")
                pu, pi, valid = removed_pairs
                q = (pu.astype(jnp.int32) * graph.num_items
                     + pi.astype(jnp.int32))
                pos = jnp.clip(jnp.searchsorted(graph.lookup_keys, q), 0,
                               graph.lookup_keys.shape[0] - 1)
                hit = ((graph.lookup_keys[pos] == q)
                       & (valid > 0)).astype(jnp.float32)
                rating = jnp.take(graph.edge_rating,
                                  graph.lookup_perm[pos])
                removed_info = (pu, pi, hit, rating)
        # ---- degrees / support of the step graph (reference recomputes
        # support on every edge-removed graph: graph.py:414-429) ----
        sup_u = sup_i = None
        if use_static and variant_degrees is not None:
            # Static variant degrees corrected for removed batch edges —
            # no O(E) scatter in the step at all.
            deg_u, deg_i = variant_degrees
            if removed_info is not None:
                pu, pi, hit, _ = removed_info
                from stargcn_tpu.ops.gather import onehot_segment_sum
                deg_u = deg_u - onehot_segment_sum(
                    hit, pu, graph.num_users)
                deg_i = deg_i - onehot_segment_sum(
                    hit, pi, graph.num_items)
        else:
            mask = edge_mask * graph.edge_pad_mask
            deg_u, deg_i = masked_degrees(
                graph.edge_user, graph.edge_item, mask,
                graph.num_users, graph.num_items)
        if not use_static:
            if cfg.agg_norm_symm:
                sup = edge_support(deg_u, deg_i, graph.edge_user,
                                   graph.edge_item, mask, symm=True)
                sup_u = sup_i = sup
            else:
                # target user <- movie: support rows are users (1/d_user)
                sup_u = edge_support(deg_u, deg_i, graph.edge_user,
                                     graph.edge_item, mask, symm=False)
                sup_i = edge_support(deg_i, deg_u, graph.edge_item,
                                     graph.edge_user, mask, symm=False)
        # For the MXU backend, scatter the per-edge support into a dense
        # (R, Nu, Ni) tensor ONCE per step; both aggregation directions and
        # every block then run as pure batched matmuls (the support has no
        # parameter dependence, so gradients never flow through the
        # scatter — stop_gradient keeps the backward pass matmul-only).
        dense_u = dense_i = None
        dense_i_transposed = False
        static_u = static_i = None
        ell_u = ell_i = None
        bit_u = bit_i = None
        if use_bit:
            # Bit-packed dense MXU fast path: static 1-bit adjacency
            # operands per variant, scalings from the masked degrees,
            # removal as a batch-sized correction (ops/bitdense.py).
            bit_u, bit_i = _build_bit_static_operands(
                cfg, ell_pack, deg_u, deg_i, removed_info)
        elif use_ell:
            # Chunked-ELL sparse fast path: static per-variant index
            # arrays, scalings from the masked degrees, removal as a
            # batch-sized correction (ops/chunked_ell.py).
            ell_u, ell_i = _build_ell_static_operands(
                cfg, ell_pack, deg_u, deg_i, removed_info)
        elif use_static:
            # Fast path: static per-variant adjacency (built once outside
            # the step), scalings from the masked degrees, removal as a
            # batch-sized correction.
            static_u, static_i = _build_dense_static_operands(
                cfg, graph, dense_adj, deg_u, deg_i, removed_info)
        elif cfg.backend == "dense":
            from stargcn_tpu.ops.agg import build_dense_support

            dense_u = jax.lax.stop_gradient(build_dense_support(
                graph.edge_item, graph.edge_user, graph.edge_rating,
                sup_u, graph.num_links, graph.num_users, graph.num_items))
            if cfg.agg_norm_symm:
                dense_i, dense_i_transposed = dense_u, True
            else:
                dense_i = jax.lax.stop_gradient(build_dense_support(
                    graph.edge_user, graph.edge_item, graph.edge_rating,
                    sup_i, graph.num_links, graph.num_items,
                    graph.num_users))
        relations = {
            ("user", "item"): Relation(
                edge_src=graph.edge_item, edge_dst=graph.edge_user,
                edge_rating=graph.edge_rating, support=sup_u,
                num_links=graph.num_links, dense_support=dense_u,
                dense_static=static_u, ell_static=ell_u,
                bit_static=bit_u),
            ("item", "user"): Relation(
                edge_src=graph.edge_user, edge_dst=graph.edge_item,
                edge_rating=graph.edge_rating, support=sup_i,
                num_links=graph.num_links, dense_support=dense_i,
                dense_transposed=dense_i_transposed,
                dense_static=static_i, ell_static=ell_i,
                bit_static=bit_i),
        }
        meta = {"user": ["item"], "item": ["user"]}

        # ---- embeddings with noise masking (STAR-GCN.py:264-300) ----
        gt_embed = {}
        input_feat = {}
        if cfg.use_embed:
            embed_u = nn.Embed(cfg.num_users, cfg.embed_units,
                               embedding_init=uniform_sym(0.1),
                               name="embed_user")
            embed_i = nn.Embed(cfg.num_items, cfg.embed_units,
                               embedding_init=uniform_sym(0.1),
                               name="embed_item")
            gt_embed = {"user": embed_u.embedding, "item": embed_i.embedding}
            input_feat = {
                "user": _masked_embed(embed_u, noise_user, cfg.num_users,
                                      cfg.self_noise_only),
                "item": _masked_embed(embed_i, noise_item, cfg.num_items,
                                      cfg.self_noise_only),
            }
        fea_proj = {}
        if cfg.use_fea_proj:
            for key, fea in (("user", user_features), ("item", item_features)):
                h = nn.Dense(cfg.fea_mid_map, kernel_init=xavier_in,
                             name=f"fea_map_{key}_l0")(fea)
                h = act(h)
                h = nn.Dense(cfg.fea_units, kernel_init=xavier_in,
                             name=f"fea_map_{key}_l1")(h)
                fea_proj[key] = h
            if cfg.use_embed:
                input_feat = {
                    k: jnp.concatenate([input_feat[k], fea_proj[k]], axis=-1)
                    for k in input_feat}
            else:
                input_feat = dict(fea_proj)

        out_emb_units = cfg.embed_units + (
            cfg.fea_units if (cfg.use_fea_proj and cfg.recon_fea) else 0)
        if cfg.use_fea_proj and cfg.recon_fea:
            gt_embed = {k: jnp.concatenate([gt_embed[k], fea_proj[k]], -1)
                        for k in gt_embed}

        # ---- blocks ----
        cdt = jnp.dtype(cfg.compute_dtype)
        if cdt != jnp.float32:
            input_feat = {k: v.astype(cdt) for k, v in input_feat.items()}
        layer_cfgs = [
            dict(meta=meta, agg_units=au, out_units=ou,
                 dropout_rate=cfg.gcn_dropout,
                 agg_ordinal_sharing=cfg.agg_ordinal_sharing,
                 agg_accum=cfg.agg_accum, agg_act=cfg.activation,
                 out_act=cfg.activation, backend=cfg.backend,
                 edge_chunk=cfg.edge_chunk,
                 dropout_per_edge=cfg.dropout_per_edge, dtype=cdt)
            for au, ou in zip(cfg.agg_units, cfg.out_units)
        ]
        recurrent_depth = (len(cfg.agg_units)
                           if cfg.gcn_use_recurrent else None)

        # Parameter blocks: 1 when USE_RECURRENT (weights shared across
        # blocks, STAR-GCN.py:199/233/253), else NBLOCKS.  Modules are
        # created once and reused, so flax shares parameters naturally.
        n_param_blocks = 1 if cfg.use_recurrent else cfg.nblocks
        encoders = [
            StackedHeterGCNLayers(
                layer_cfgs=(layer_cfgs[:1] if recurrent_depth else
                            layer_cfgs),
                recurrent_layer_num=recurrent_depth, name=f"enc_b{p}")
            for p in range(n_param_blocks)]
        user_projs = [nn.Dense(cfg.gen_rating_mid_map,
                               kernel_init=xavier_in, dtype=cdt,
                               name=f"rating_user_proj_b{p}")
                      for p in range(n_param_blocks)]
        item_projs = [nn.Dense(cfg.gen_rating_mid_map,
                               kernel_init=xavier_in, dtype=cdt,
                               name=f"rating_item_proj_b{p}")
                      for p in range(n_param_blocks)]
        embed_maps = [
            {key: [nn.Dense(out_emb_units, kernel_init=xavier_in,
                            dtype=cdt, name=f"embed_map_b{p}_{key}_l0"),
                   nn.Dense(out_emb_units, kernel_init=xavier_in,
                            dtype=cdt, name=f"embed_map_b{p}_{key}_l1")]
             for key in ("user", "item")}
            for p in range(n_param_blocks)] if cfg.use_dae else []
        # Shared across blocks like the reference's single ``gen_ratings``
        # instance (STAR-GCN.py:261).
        gen_ratings = InnerProductLayer(name="gen_ratings")

        pred_ratings, pred_embed = [], []
        rating_feats = None
        feats = input_feat
        for block_id in range(cfg.nblocks):
            pidx = 0 if cfg.use_recurrent else block_id
            output = encoders[pidx](feats, relations, train=train)

            # rating head (STAR-GCN.py:428-438).  take_rows: the plain
            # take's gradient is a scatter-add, which XLA serializes at
            # ~5 us/row on this TPU runtime (xplane-traced: 4 rating-
            # head scatters cost 91 of 133 ms/step at wide widths); the
            # one-hot-matmul backward runs on the MXU instead.
            u_rows = take_rows(output["user"], pairs_user)
            i_rows = take_rows(output["item"], pairs_item)
            score = gen_ratings(user_projs[pidx](u_rows),
                                item_projs[pidx](i_rows))
            pred_ratings.append(score[:, 0].astype(jnp.float32))

            # Serving export: the LAST block's projected node states are
            # a complete scoring artifact — gen_ratings is a pure inner
            # product (mid_units=None), so rating(u, i) = feats_u . feats_i
            # for every pair without re-running the GCN (stargcn_tpu/serve.py).
            if return_rating_feats and block_id == cfg.nblocks - 1:
                rating_feats = {
                    "user": user_projs[pidx](output["user"]),
                    "item": item_projs[pidx](output["item"]),
                }

            # decoder / next-block input (STAR-GCN.py:441-459): the same
            # embed_map serves both, so compute it once over all nodes.
            if cfg.use_dae:
                mapped = {}
                for key in ("user", "item"):
                    l0, l1 = embed_maps[pidx][key]
                    mapped[key] = l1(act(l0(output[key])))
                pred_embed.append(mapped)
                if block_id < cfg.nblocks - 1:
                    feats = mapped
                    if cfg.use_fea_proj and not cfg.recon_fea:
                        feats = {k: jnp.concatenate([feats[k], fea_proj[k]],
                                                    -1) for k in feats}

        out = {
            "pred_ratings": jnp.stack(pred_ratings, axis=0),
            "pred_embed": pred_embed,
            "gt_embed": gt_embed,
        }
        if return_rating_feats:
            out["rating_feats"] = rating_feats
        return out


def _norm_scales(cfg, deg_u, deg_i):
    """Separable degree-scale vectors per direction: ``{target_type:
    (dst_scale, src_scale)}`` with ``support = dst_scale * src_scale``
    (symmetric norm) or ``1/d_dst`` (reference ``get_support``,
    ``graph_sampler.cpp:393-420``)."""
    if cfg.agg_norm_symm:
        s_u = jnp.where(deg_u > 0, jax.lax.rsqrt(jnp.maximum(deg_u, 1e-12)),
                        0.0)
        s_i = jnp.where(deg_i > 0, jax.lax.rsqrt(jnp.maximum(deg_i, 1e-12)),
                        0.0)
        return {"user": (s_u, s_i), "item": (s_i, s_u)}
    inv_u = jnp.where(deg_u > 0, 1.0 / jnp.maximum(deg_u, 1e-12), 0.0)
    inv_i = jnp.where(deg_i > 0, 1.0 / jnp.maximum(deg_i, 1e-12), 0.0)
    ones_u = jnp.ones_like(deg_u)
    ones_i = jnp.ones_like(deg_i)
    return {"user": (inv_u, ones_i), "item": (inv_i, ones_u)}


def _build_bit_static_operands(cfg, bit_pack, deg_u, deg_i, removed_info):
    """Assemble ``BitStatic`` operands for both aggregation directions.

    ``bit_pack``: ``{"user"|"item": {"pf","pb","d8","s8"}}`` bit-packed
    adjacency layouts per direction (``ops.bitdense.build_bit_pack``);
    each direction's ``pb`` is the other's forward layout.
    """
    from stargcn_tpu.models.layers import BitStatic
    from stargcn_tpu.ops.bitdense import resolve_impl

    impl = resolve_impl(cfg.bit_impl)
    scales = _norm_scales(cfg, deg_u, deg_i)
    rem = {"user": (None,) * 4, "item": (None,) * 4}
    if removed_info is not None:
        pu, pi, hit, r = removed_info
        rem = {"user": (pi, pu, r, hit), "item": (pu, pi, r, hit)}

    def make(t):
        p = bit_pack[t]
        rs, rd, rr, rw = rem[t]
        return BitStatic(
            p_fwd=p["pf"], p_bwd=p["pb"],
            dst_scale=scales[t][0], src_scale=scales[t][1],
            rem_src=rs, rem_dst=rd, rem_rating=rr, rem_weight=rw,
            d8_dst=p["pf"].shape[0] // cfg.num_links,
            d8_src=p["pb"].shape[0] // cfg.num_links, impl=impl)

    return make("user"), make("item")


def _build_ell_static_operands(cfg, ell_pack, deg_u, deg_i, removed_info):
    """Assemble ``EllStatic`` operands for both aggregation directions.

    ``ell_pack``: ``{"user"|"item": {"idx","rat","row"}}`` chunked-ELL
    arrays per direction (dst = that type); each direction's backward
    arrays are simply the OTHER direction's forward arrays (the same
    bipartite edge set viewed from the other side).
    """
    from stargcn_tpu.models.layers import EllStatic

    scales = _norm_scales(cfg, deg_u, deg_i)
    rem = {"user": (None,) * 4, "item": (None,) * 4}
    if removed_info is not None:
        pu, pi, hit, r = removed_info
        rem = {"user": (pi, pu, r, hit), "item": (pu, pi, r, hit)}

    def make(t, other):
        p, q = ell_pack[t], ell_pack[other]
        rs, rd, rr, rw = rem[t]
        return EllStatic(
            f_idx=p["idx"], f_rat=p["rat"], f_row=p["row"],
            b_idx=q["idx"], b_rat=q["rat"], b_row=q["row"],
            dst_scale=scales[t][0], src_scale=scales[t][1],
            rem_src=rs, rem_dst=rd, rem_rating=rr, rem_weight=rw,
            chunk=cfg.ell_chunk, bf16=cfg.ell_bf16)

    return make("user", "item"), make("item", "user")


def _build_dense_static_operands(cfg, graph, dense_adj, deg_u, deg_i,
                                 removed_info):
    """Assemble ``DenseStatic`` operands for both aggregation directions.

    ``dense_adj``: (R, Nu, Ni) 0/1 variant adjacency (dst = user
    orientation); the item direction reuses it transposed.
    ``removed_info``: optional ``(pu, pi, hit, rating)`` removed-edge
    arrays (hit = 1 for real removed edges).
    """
    from stargcn_tpu.models.layers import DenseStatic

    scales = _norm_scales(cfg, deg_u, deg_i)

    adj = jax.lax.stop_gradient(dense_adj)
    if removed_info is not None:
        # Rank-B dense removal: ONE scalar scatter (width 1) builds the
        # removed-edge mask; subtracting it from the 0/1 adjacency makes
        # every subsequent aggregation (and its gradient) a pure matmul.
        # This replaced per-aggregator row-scatter corrections that
        # dominated the device step (8 x ~0.16 ms in the profile).
        pu, pi, hit, r = removed_info
        R, nu_, ni_ = adj.shape
        idx = (r * nu_ + pu) * ni_ + pi
        delta = jnp.zeros((R * nu_ * ni_,), adj.dtype).at[idx].add(
            hit.astype(adj.dtype)).reshape(R, nu_, ni_)
        adj = jax.lax.stop_gradient(adj - delta)  # 0/1 exact in bf16

    static_u = DenseStatic(
        adj=adj, dst_scale=scales["user"][0], src_scale=scales["user"][1],
        transposed=False)
    static_i = DenseStatic(
        adj=adj, dst_scale=scales["item"][0], src_scale=scales["item"][1],
        transposed=True)
    return static_u, static_i


def _masked_embed(embed: nn.Embed, noise, num_nodes: int,
                  self_noise_only: bool = True):
    """Embeddings through the noise array (-1 -> zero vector)."""
    if noise is None:
        return embed.embedding
    keep = (noise != -1)
    if self_noise_only:
        # noise[i] in {-1, i}: a row mask over the table suffices, and
        # the gradient stays elementwise (no scatter).
        return embed.embedding * keep[:, None].astype(jnp.float32)
    ids = jnp.where(keep, noise, 0)
    return embed(ids) * keep[:, None].astype(jnp.float32)

"""Heterogeneous GCN layers over full-graph edge arrays (flax.linen).

Re-design of ``mxgraph/layers/layers.py``.  The reference's two-phase
host-plan/device-execute machinery (``gen_plan``/``heter_sage``,
``layers.py:260-385``) does not exist here: with full-graph propagation
over static edge arrays, a stacked layer is just a loop of fused
aggregations inside one jitted program (SURVEY.md §7 design delta 1-2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stargcn_tpu.models.aggregators import MultiLinkGCNAggregator
from stargcn_tpu.models.common import get_activation, xavier_in


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseStatic:
    """Static-adjacency MXU aggregation operands.

    ``adj`` is the 0/1 per-rating adjacency of the graph VARIANT (never
    rebuilt per step); per-step graph state enters only through the
    degree-scale vectors and the optional removed-edge correction arrays
    (see ``ops.agg.scaled_dense_aggregate``).
    """

    adj: jax.Array                      # (R, D, S) or (R, S, D) if transposed
    dst_scale: jax.Array                # (num_dst,)
    src_scale: jax.Array                # (num_src,)
    rem_src: jax.Array | None = None    # (B,) removed-edge arrays
    rem_dst: jax.Array | None = None
    rem_rating: jax.Array | None = None
    rem_weight: jax.Array | None = None
    transposed: bool = dataclasses.field(
        default=False, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllStatic:
    """Chunked-ELL aggregation operands for one direction (see
    ``ops.chunked_ell``): static per-variant index arrays for the forward
    (``f_*``, rows = dst nodes) and transpose (``b_*``, rows = src nodes,
    drives the custom-vjp backward) directions, separable degree-scale
    vectors, and optional removed-batch-edge correction arrays."""

    f_idx: jax.Array                    # (V, K) int32, pad -> num_src
    f_rat: jax.Array                    # (V, K) int32
    f_row: jax.Array                    # (V,) int32 sorted dst rows
    b_idx: jax.Array                    # (V', K') transpose arrays
    b_rat: jax.Array
    b_row: jax.Array
    dst_scale: jax.Array                # (num_dst,)
    src_scale: jax.Array                # (num_src,)
    rem_src: jax.Array | None = None    # (B,) removed-edge arrays
    rem_dst: jax.Array | None = None
    rem_rating: jax.Array | None = None
    rem_weight: jax.Array | None = None
    chunk: int | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    bf16: bool = dataclasses.field(
        default=False, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BitStatic:
    """Bit-packed dense aggregation operands for one direction (see
    ``ops.bitdense``): the 1-bit-per-entry multi-link adjacency in this
    direction's layout (``p_fwd``) and the transpose layout driving the
    custom-vjp backward (``p_bwd``), separable degree-scale vectors, and
    optional removed-batch-edge correction arrays."""

    p_fwd: jax.Array                    # (R * d8_dst, S_pad) uint8
    p_bwd: jax.Array                    # (R * d8_src, D_pad) uint8
    dst_scale: jax.Array                # (num_dst,)
    src_scale: jax.Array                # (num_src,)
    rem_src: jax.Array | None = None    # (B,) removed-edge arrays
    rem_dst: jax.Array | None = None
    rem_rating: jax.Array | None = None
    rem_weight: jax.Array | None = None
    d8_dst: int = dataclasses.field(default=0, metadata=dict(static=True))
    d8_src: int = dataclasses.field(default=0, metadata=dict(static=True))
    impl: str = dataclasses.field(default="pallas",
                                  metadata=dict(static=True))
    interpret: bool = dataclasses.field(default=False,
                                        metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Relation:
    """Directed edge arrays for one (target <- neighbor) relation.

    ``edge_src`` indexes the neighbor type's nodes, ``edge_dst`` the
    target type's nodes; ``support`` carries mask x degree normalisation
    (0 on removed/padded edges).
    """

    edge_src: jax.Array
    edge_dst: jax.Array
    edge_rating: jax.Array
    support: jax.Array
    num_links: int = dataclasses.field(metadata=dict(static=True))
    # Optional pre-built dense support tensor for the naive MXU backend:
    # (R, num_dst, num_src), or (R, num_src, num_dst) when
    # ``dense_transposed`` (shared between both directions of a
    # symmetric-normalised bipartite graph).
    dense_support: jax.Array | None = None
    dense_transposed: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # Static-adjacency fast path (preferred when available).
    dense_static: DenseStatic | None = None
    # Chunked-ELL sparse fast path for big graphs (ops/chunked_ell.py).
    ell_static: EllStatic | None = None
    # Bit-packed dense MXU fast path for big graphs (ops/bitdense.py).
    bit_static: BitStatic | None = None


class HeterGCNLayer(nn.Module):
    """One heterogeneous GCN layer.

    Semantics per ``layers.py:42-208``: for each target type, aggregate
    each neighbor relation with a (multi-link) aggregator, dropout the
    aggregated features, accumulate across relations ('stack' concat /
    'sum'), optionally add a self-projection (``accum_self``,
    ``layers.py:130-141``), then a per-type output Dense + activation.

    Attributes:
      agg_units / out_units: int or {type: int}; a type with ``None``
        out_units is skipped (no output for that type).
      target_keys: which types to produce (reference ``source_keys``).
    """

    meta: Dict[str, Sequence[str]]  # target type -> neighbor types
    agg_units: Any
    out_units: Any
    target_keys: Optional[Sequence[str]] = None
    dropout_rate: float = 0.0
    agg_ordinal_sharing: bool = False
    agg_accum: str = "stack"
    agg_act: Optional[str] = "relu"
    layer_accum: str = "stack"
    accum_self: bool = False
    out_act: Optional[str] = None
    backend: str = "xla"
    edge_chunk: Optional[int] = None
    dropout_per_edge: bool = False
    # compute dtype for the Denses/aggregator matmuls (mixed precision;
    # params stay f32 — flax casts both operands per-call)
    dtype: Any = None

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array],
                 relations: Dict[Tuple[str, str], Relation], *,
                 train: bool = False) -> Dict[str, jax.Array]:
        targets = (list(self.target_keys) if self.target_keys is not None
                   else list(self.meta.keys()))
        agg_units = (self.agg_units if isinstance(self.agg_units, dict)
                     else {k: self.agg_units for k in self.meta})
        out_units = (self.out_units if isinstance(self.out_units, dict)
                     else {k: self.out_units for k in targets})
        dropout = nn.Dropout(self.dropout_rate, deterministic=not train)
        out = {}
        for t in targets:
            pooled = []
            for s in self.meta[t]:
                rel = relations[(t, s)]
                agg = MultiLinkGCNAggregator(
                    units=agg_units[t], num_links=rel.num_links,
                    act=self.agg_act, dropout_rate=self.dropout_rate,
                    ordinal_sharing=self.agg_ordinal_sharing,
                    accum=self.agg_accum, backend=self.backend,
                    edge_chunk=self.edge_chunk,
                    dropout_per_edge=self.dropout_per_edge,
                    dtype=self.dtype, name=f"agg_{t}_{s}")
                pooled.append(dropout(agg(
                    features[s], rel.edge_src, rel.edge_dst,
                    rel.edge_rating, rel.support,
                    num_dst=features[t].shape[0], train=train,
                    dense_support=rel.dense_support,
                    dense_transposed=rel.dense_transposed,
                    dense_static=rel.dense_static,
                    ell_static=rel.ell_static,
                    bit_static=rel.bit_static)))
            if self.accum_self:
                h = dropout(features[t])
                h = nn.Dense(out_units[t], kernel_init=xavier_in,
                             dtype=self.dtype, name=f"self_fc_{t}")(h)
                pooled.append(dropout(h))
            if len(pooled) == 1:
                acc = pooled[0]
            elif self.layer_accum == "stack":
                acc = jnp.concatenate(pooled, axis=-1)
            elif self.layer_accum == "sum":
                acc = sum(pooled)
            else:
                raise NotImplementedError(self.layer_accum)
            if out_units[t] is None:
                out[t] = acc
                continue
            h = nn.Dense(out_units[t], kernel_init=xavier_in,
                         dtype=self.dtype, name=f"out_fc_{t}")(acc)
            out[t] = get_activation(self.out_act)(h)
        return out


class StackedHeterGCNLayers(nn.Module):
    """L stacked layers with optional recurrent weight sharing.

    ``recurrent_layer_num`` mirrors ``layers.py:224-258``: when set, ONE
    layer's parameters are reused at every depth.
    """

    layer_cfgs: Sequence[dict]
    recurrent_layer_num: Optional[int] = None

    @nn.compact
    def __call__(self, features, relations, *, train: bool = False):
        if self.recurrent_layer_num is not None:
            assert len(self.layer_cfgs) == 1
            layer = HeterGCNLayer(**self.layer_cfgs[0], name="l0")
            for _ in range(self.recurrent_layer_num):
                features = layer(features, relations, train=train)
            return features
        for i, cfg in enumerate(self.layer_cfgs):
            layer = HeterGCNLayer(**cfg, name=f"l{i}")
            features = layer(features, relations, train=train)
        return features


class InnerProductLayer(nn.Module):
    """Row-wise inner product with optional shared mid Dense
    (``layers.py:210-222``)."""

    mid_units: Optional[int] = None

    @nn.compact
    def __call__(self, data1, data2):
        if self.mid_units is not None:
            mid = nn.Dense(self.mid_units, kernel_init=xavier_in,
                           name="mid_map")
            data1, data2 = mid(data1), mid(data2)
        # accumulate the inner product in f32 regardless of the compute
        # dtype (a bf16 reduction loses rating-scale precision)
        prod = (data1 * data2).astype(jnp.float32)
        return jnp.sum(prod, axis=-1, keepdims=True)

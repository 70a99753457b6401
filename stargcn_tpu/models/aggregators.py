"""Per-rating-level GCN aggregators (flax.linen, full-graph edge arrays).

Re-design of the reference ``GCNAggregator``/``MultiLinkGCNAggregator``
(``mxgraph/layers/aggregators.py:21-163``).  The reference loops over
rating levels, launching one FullyConnected + ``seg_weighted_pool`` per
level on per-level CSR slices; here all levels run as one batched
projection (a single MXU contraction) + one fused gather/segment-sum over
the flat edge arrays (``stargcn_tpu.ops.agg``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stargcn_tpu.models.common import get_activation, xavier_in
from stargcn_tpu.ops.agg import (
    multi_link_aggregate,
    multi_link_project,
    removed_edges_correction,
    scaled_dense_aggregate,
)


class MultiLinkGCNAggregator(nn.Module):
    """Multi-link graph-conv aggregator.

    Semantics match ``aggregators.py:58-163``:

    * 'stack' accumulation splits ``units`` across links
      (``units // num_links`` each, concatenated); 'sum' gives every link
      ``units`` and adds (``aggregators.py:79-81, 151-159``).
    * optional ordinal weight sharing ``W_i = sum_{j<=i} w_j``
      (``aggregators.py:133-140``).
    * dropout is applied to the SOURCE features before projection
      (``aggregators.py:131``), so each source node's mask is shared by
      all its outgoing edges.  Set ``dropout_per_edge`` for the
      reference's exact granularity — an independent elementwise mask on
      each GATHERED per-edge row (the reference drops the
      ``mx.nd.take``n neighbor matrix) — at the cost of an O(E, F)
      gather, for quality A/B runs (``GCN.DROPOUT_PER_EDGE``).
    * the per-link bias rides through the support-weighted pooling, like
      the reference's FC-then-pool order.

    Call with full-graph edge arrays; ``support`` must already carry the
    edge mask and degree normalisation.
    """

    units: int
    num_links: int
    act: Optional[str] = None
    dropout_rate: float = 0.0
    ordinal_sharing: bool = False
    accum: str = "stack"
    backend: str = "xla"
    edge_chunk: int | None = None
    dropout_per_edge: bool = False
    # compute dtype (mixed precision): params stay f32; weight/bias are
    # cast per-call so the projection matmul runs at the MXU's native
    # bf16 rate with f32 accumulation.
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_src, edge_src, edge_dst, edge_rating, support,
                 num_dst, *, train: bool = False, dense_support=None,
                 dense_transposed: bool = False, dense_static=None,
                 ell_static=None, bit_static=None):
        if self.accum == "stack":
            assert self.units % self.num_links == 0, (
                "units must be divisible by num_links for 'stack'")
            link_units = self.units // self.num_links
        elif self.accum == "sum":
            link_units = self.units
        else:
            raise NotImplementedError(self.accum)
        weight = self.param(
            "weight", xavier_in,
            (self.num_links, x_src.shape[-1], link_units))
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_links, link_units))
        if self.dtype is not None:
            weight = weight.astype(self.dtype)
            bias = bias.astype(self.dtype)
            x_src = x_src.astype(self.dtype)

        if self.dropout_per_edge:
            # Parity-exact granularity (reference aggregators.py:131):
            # gather the raw source rows per edge, drop ELEMENTS of the
            # gathered (E, F) matrix, project per link, support-weighted
            # segment-sum.  Only the flat-edge formulation can express a
            # per-edge mask (the dense/ell operands never materialise
            # per-edge feature rows), so build_model_config forces the
            # xla backend with this mode.
            assert (dense_static is None and ell_static is None
                    and bit_static is None), (
                "DROPOUT_PER_EDGE requires the flat-edge (xla) backend")
            msg = jnp.take(x_src, edge_src, axis=0)
            msg = nn.Dropout(self.dropout_rate,
                             deterministic=not train)(msg)
            # The appended UNdropped ones column carries the per-link
            # bias through the pooling (bias is added after the
            # reference's FC, so it is never dropped).
            msg = jnp.concatenate(
                [msg, jnp.ones_like(msg[:, :1])], axis=-1)
            msg = msg * support[:, None]
            seg = edge_dst * self.num_links + edge_rating
            pooled = jax.ops.segment_sum(
                msg, seg,
                num_segments=num_dst * self.num_links).reshape(
                    num_dst, self.num_links, -1)
            w_aug = jnp.concatenate([weight, bias[:, None, :]], axis=1)
            if self.ordinal_sharing:
                w_aug = jnp.cumsum(w_aug, axis=0)
            out = jnp.einsum("drf,rfu->dru", pooled, w_aug,
                             preferred_element_type=jnp.float32
                             ).astype(x_src.dtype)
            if self.accum == "stack":
                out = out.reshape(num_dst, self.num_links * link_units)
            else:
                out = out.sum(axis=1)
            return get_activation(self.act)(out)

        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x_src)
        if bit_static is not None:
            # Bit-packed dense MXU path (big graphs): the multi-link
            # adjacency is a static 1-bit operand whose bit planes are
            # unpacked to bf16 tile-by-tile in VMEM (ops/bitdense.py) —
            # zero gathers/scatters in forward or backward.
            from stargcn_tpu.ops.bitdense import bit_multi_link_aggregate

            out = bit_multi_link_aggregate(
                x, bit_static, weight, bias,
                ordinal_sharing=self.ordinal_sharing, accum=self.accum)
            return get_activation(self.act)(out)
        if ell_static is not None:
            # Chunked-ELL sparse path (big graphs): aggregates the raw
            # features per rating and projects afterwards — linear-
            # equivalent to project-then-pool (ops/chunked_ell.py).
            from stargcn_tpu.ops.chunked_ell import ell_multi_link_aggregate

            out = ell_multi_link_aggregate(
                x, ell_static, weight, bias,
                ordinal_sharing=self.ordinal_sharing, accum=self.accum)
            return get_activation(self.act)(out)
        proj = multi_link_project(x, weight, bias,
                                  ordinal_sharing=self.ordinal_sharing)
        if dense_static is not None:
            # Static-adjacency MXU path: degree scalings folded around the
            # matmul, per-batch edge removal as a small correction.
            ds = dense_static
            pooled = scaled_dense_aggregate(
                proj, ds.adj, ds.dst_scale, ds.src_scale,
                transposed=ds.transposed)
            if ds.rem_src is not None:
                pooled = pooled - removed_edges_correction(
                    proj, ds.rem_src, ds.rem_dst, ds.rem_rating,
                    ds.rem_weight, num_dst)
            if self.accum == "stack":
                out = pooled.reshape(num_dst, self.num_links * link_units)
            else:
                out = pooled.sum(axis=1)
        else:
            out = multi_link_aggregate(
                proj, edge_src, edge_dst, edge_rating, support, num_dst,
                accum=self.accum, backend=self.backend,
                dense_support=dense_support,
                dense_transposed=dense_transposed,
                edge_chunk=self.edge_chunk)
        return get_activation(self.act)(out)


class GCNAggregator(nn.Module):
    """Single-link aggregator == MultiLink with ``num_links=1``
    (``aggregators.py:21-55``)."""

    units: int
    act: Optional[str] = None
    dropout_rate: float = 0.0
    backend: str = "xla"

    @nn.compact
    def __call__(self, x_src, edge_src, edge_dst, support, num_dst, *,
                 train: bool = False):
        agg = MultiLinkGCNAggregator(
            units=self.units, num_links=1, act=self.act,
            dropout_rate=self.dropout_rate, backend=self.backend)
        edge_rating = jnp.zeros_like(edge_src)
        return agg(x_src, edge_src, edge_dst, edge_rating, support, num_dst,
                   train=train)

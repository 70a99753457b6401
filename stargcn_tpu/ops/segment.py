"""Segment operators over CSR-style ``indptr`` segments — XLA formulation.

These are the TPU-native equivalents of the reference's custom CUDA/MXNet
operators (``seg_ops_cuda/mxnet_op/seg_op.cc``; CPU reference semantics at
``seg_op.cc:7-332``, CUDA kernels in ``seg_op.cu``).  Where the reference
hand-writes cub-based segmented reductions (``cub::DeviceSegmentedReduce``,
``seg_op.cu:174-206``), the reductions here pick a formulation by the
position of the segment axis in the TPU tile layout (measured on
hardware, ``scripts/bench_segops_micro.py``):

* NARROW rows (the reduced ``nnz`` axis is the trailing axis, as in the
  ``(K, nnz)`` score arrays of ``seg_sum``/``seg_max``/``seg_softmax``):
  a **segmented associative scan** (Blelloch-style, the scan operator
  resets at segment-start flags), which lowers to log-depth streaming
  elementwise passes on the VPU.  The log(nnz) traffic multiplier is
  cheap when each scanned position is a few floats, and it avoids the
  per-element scatter overhead entirely: 16 ms vs 28 ms scatter at the
  softmax harness shape (and 118 ms for the round-1 searchsorted
  variant).  Per-segment results are read out of the scan at each
  segment's last element; resetting at boundaries (rather than
  differencing prefix sums) keeps rounding error local to a segment.
* WIDE rows (the reduced axis carries a ``feat`` trailing dim, as in the
  ``(batch, nnz, feat)`` pools): the one-pass gather + ``segment_sum``
  scatter formulation.  The scan's log-depth passes would move the full
  ``feat``-wide rows ~17x (51 ms at the harness pool shape, F=250); the
  scatter moves them once (8.6 ms; 13 ms with round-1 searchsorted ids).

All shapes are static (``nnz`` from the data array, segment count from
``indptr`` length), so a single compiled program serves every step.

Conventions (mirroring the reference operator contracts):

* ``data``:   ``(batch, nnz)`` or ``(batch, nnz, feat)`` float array.
* ``indptr``: ``(num_seg + 1,)`` int32, ``indptr[0] == 0``,
  ``indptr[-1] == nnz``; segment ``i`` covers ``[indptr[i], indptr[i+1])``.
* Empty segments reduce to ``0`` (matching the zero-initialised outputs of
  the reference CPU implementations).

Gradients come from JAX autodiff: the adjoint structure the reference
encodes manually via NNVM ``FGradient`` graphs (``seg_op.cc:647-712`` —
``seg_weighted_pool``/``seg_take_k_corr``/scatter are mutually adjoint)
falls out of ``segment_sum``/gather transposition automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def indptr_to_segment_ids(indptr: jax.Array, nnz: int) -> jax.Array:
    """Expand a CSR ``indptr`` into per-element segment ids.

    Equivalent of the reference's ``gen_row_indices_by_indptr``
    (``GraphSampler/graph_sampler.cpp:378-391``) and of the CUDA
    ``FillSegStartIndex`` + inclusive-max-scan trick (``seg_op.cu:69-110``):
    scatter a +1 mark at each interior segment boundary (O(num_seg), vs a
    per-element binary search) and inclusive-sum it.  Boundary marks of
    empty trailing segments land out of bounds and are dropped, which is
    exactly right — those segments contain no positions.
    """
    marks = jnp.zeros((nnz,), jnp.int32)
    marks = marks.at[indptr[1:-1]].add(1, mode="drop")
    return jnp.cumsum(marks)


def _num_segments(indptr: jax.Array) -> int:
    return indptr.shape[0] - 1


def _segment_start_flags(indptr: jax.Array, nnz: int) -> jax.Array:
    """Boolean (nnz,) mask, True where a segment begins."""
    starts = jnp.zeros((nnz,), jnp.bool_)
    return starts.at[indptr[:-1]].set(True, mode="drop")


def _seg_scatter_reduce(
    data: jax.Array, indptr: jax.Array, op, axis: int
) -> jax.Array:
    """Per-segment reduction via ``jax.ops.segment_*`` (scatter) — the
    fast formulation when ``axis`` is the minor (lane) axis."""
    nnz = data.shape[axis]
    num_seg = _num_segments(indptr)
    seg_ids = indptr_to_segment_ids(indptr, nnz)
    reducer = {jnp.add: jax.ops.segment_sum,
               jnp.maximum: jax.ops.segment_max,
               jnp.minimum: jax.ops.segment_min}[op]
    moved = jnp.moveaxis(data, axis, 0)
    out = reducer(moved, seg_ids, num_segments=num_seg)
    if op is not jnp.add:  # max/min of an empty segment -> 0, not +-inf
        empty_shape = (num_seg,) + (1,) * (out.ndim - 1)
        empty = (indptr[1:] == indptr[:-1]).reshape(empty_shape)
        out = jnp.where(empty, jnp.zeros_like(out), out)
    return jnp.moveaxis(out, 0, axis)


def _seg_scan_reduce(
    data: jax.Array, indptr: jax.Array, op, axis: int = -1
) -> jax.Array:
    """Per-segment reduction over ``axis``; formulation picked by layout
    (see module docstring).

    For major axes: the combine
    ``(v1,g1) ⊕ (v2,g2) = (v2 if g2 else op(v1,v2), g1|g2)`` is the
    standard associative segmented-scan operator; the per-segment
    reduction is the scan value at the segment's last element.  Empty
    segments reduce to 0 (the reference's zero-initialised outputs,
    ``seg_op.cc:8-49``).
    """
    axis = axis % data.ndim
    nnz = data.shape[axis]
    num_seg = _num_segments(indptr)
    out_shape = data.shape[:axis] + (num_seg,) + data.shape[axis + 1:]
    if nnz == 0 or num_seg == 0:
        return jnp.zeros(out_shape, data.dtype)
    if axis != data.ndim - 1:
        # wide rows: one-pass scatter beats the log-depth scan traffic
        return _seg_scatter_reduce(data, indptr, op, axis)
    flag_shape = tuple(nnz if d == axis else 1 for d in range(data.ndim))
    flags = jnp.broadcast_to(
        _segment_start_flags(indptr, nnz).reshape(flag_shape), data.shape
    )

    def combine(a, b):
        v1, g1 = a
        v2, g2 = b
        return jnp.where(g2, v2, op(v1, v2)), g1 | g2

    scanned, _ = jax.lax.associative_scan(combine, (data, flags), axis=axis)
    last = jnp.clip(indptr[1:] - 1, 0, nnz - 1)
    out = jnp.take(scanned, last, axis=axis)
    empty_shape = tuple(num_seg if d == axis else 1 for d in range(data.ndim))
    empty = (indptr[1:] == indptr[:-1]).reshape(empty_shape)
    return jnp.where(empty, jnp.zeros_like(out), out)


def seg_sum(data: jax.Array, indptr: jax.Array) -> jax.Array:
    """Segment sum: ``out[..., i] = sum(data[..., indptr[i]:indptr[i+1]])``.

    Reference: ``seg_sum`` (``seg_op.cc:339-379``, sum branch of
    ``SegReduceImpl`` at ``seg_op.cc:8-49``).
    """
    return _seg_scan_reduce(data, indptr, jnp.add)


def seg_max(data: jax.Array, indptr: jax.Array) -> jax.Array:
    """Segment max (empty segments -> 0). Reference: ``seg_op.cc:8-49``."""
    return _seg_scan_reduce(data, indptr, jnp.maximum)


def seg_min(data: jax.Array, indptr: jax.Array) -> jax.Array:
    """Segment min (empty segments -> 0). Reference: ``seg_op.cc:8-49``."""
    return _seg_scan_reduce(data, indptr, jnp.minimum)


def seg_broadcast_to(
    rhs: jax.Array, indptr: jax.Array, nnz: int
) -> jax.Array:
    """Broadcast per-segment values to per-element positions.

    ``out[..., j] = rhs[..., seg_id(j)]``.  Reference: ``seg_broadcast_to``
    (``seg_op.cc:52-77`` / registration ``seg_op.cc:440-470``); also the
    gradient of ``seg_sum`` (``seg_op.cc:370-379``).
    """
    seg_ids = indptr_to_segment_ids(indptr, nnz)
    return jnp.take(rhs, seg_ids, axis=-1)


def seg_broadcast_add(
    lhs: jax.Array, rhs: jax.Array, indptr: jax.Array
) -> jax.Array:
    """``out[..., j] = lhs[..., j] + rhs[..., seg_id(j)]``.

    Reference: ``seg_broadcast_add`` (``seg_op.cc:52-77``).
    """
    return lhs + seg_broadcast_to(rhs, indptr, lhs.shape[-1])


def seg_broadcast_mul(
    lhs: jax.Array, rhs: jax.Array, indptr: jax.Array
) -> jax.Array:
    """``out[..., j] = lhs[..., j] * rhs[..., seg_id(j)]``.

    Reference: ``seg_broadcast_mul`` (``seg_op.cc:52-77``).
    """
    return lhs * seg_broadcast_to(rhs, indptr, lhs.shape[-1])


def seg_softmax(data: jax.Array, indptr: jax.Array) -> jax.Array:
    """Numerically-stable softmax within each segment.

    ``out[..., indptr[i]:indptr[i+1]] = softmax(data[..., same slice])``.
    Reference: ``SegSoftmaxImpl`` (``seg_op.cc:79-115``) — max-subtracted,
    same reduce-max → sub/exp → reduce-sum → div pipeline as the CUDA
    version (``seg_op.cu:345-427``), left to XLA to fuse.
    """
    nnz = data.shape[-1]
    seg_max_v = seg_max(data, indptr)
    shifted = jnp.exp(data - seg_broadcast_to(seg_max_v, indptr, nnz))
    denom = seg_sum(shifted, indptr)
    return shifted / seg_broadcast_to(denom, indptr, nnz)


def seg_take_k_corr(
    embed1: jax.Array,
    embed2: jax.Array,
    neighbor_ids: jax.Array,
    indptr: jax.Array,
) -> jax.Array:
    """SDDMM-like segment inner product (node x its neighbors).

    ``out[k, j] = dot(embed1[k, seg_id(j), :], embed2[k, neighbor_ids[j], :])``

    Reference: ``SegTakeKCorrImpl`` (``seg_op.cc:150-178``), CUDA tiled
    shared-memory kernel ``SegTakeKCorrKernel`` (``seg_op.cu:573-664``).
    On TPU this is two row gathers plus a fused elementwise-dot (VPU),
    avoiding the reference's hand-tiled shared-memory staging.

    Args:
      embed1: ``(K, num_nodes, feat)``.
      embed2: ``(K, num_neighbor_nodes, feat)``.
      neighbor_ids: ``(nnz,)`` int32 indices into ``embed2``'s node axis.
      indptr: ``(num_nodes + 1,)`` segments over ``nnz``.

    Returns:
      ``(K, nnz)`` correlation scores.
    """
    nnz = neighbor_ids.shape[0]
    seg_ids = indptr_to_segment_ids(indptr, nnz)
    lhs = jnp.take(embed1, seg_ids, axis=1)  # (K, nnz, feat)
    rhs = jnp.take(embed2, neighbor_ids, axis=1)  # (K, nnz, feat)
    return jnp.sum(lhs * rhs, axis=-1)


def seg_weighted_pool(
    data: jax.Array,
    weights: jax.Array,
    indices: jax.Array,
    indptr: jax.Array,
) -> jax.Array:
    """Weighted neighbor pooling (SpMM with per-edge weights).

    ``out[b, i, :] = sum_j weights[b, j] * data[b, indices[j], :]`` over
    ``j in [indptr[i], indptr[i+1])``.

    Reference: ``SegWeightedPoolForward`` (``seg_op.h:460-476``), which
    dispatches to the gather-accumulate CUDA kernel
    ``SegTakeKCorrBackwardEmbed1Kernel`` (``seg_op.cu:682-722``).  This is
    the hot op of the model — every graph-conv layer calls it
    (reference call site ``mxgraph/layers/aggregators.py:146-149``).

    Args:
      data: ``(batch, num_neighbor_nodes, feat)``.
      weights: ``(batch, nnz)`` per-edge weights.
      indices: ``(nnz,)`` int32 indices into ``data``'s node axis.
      indptr: ``(num_seg + 1,)`` segments over ``nnz``.

    Returns:
      ``(batch, num_seg, feat)`` pooled output.
    """
    gathered = jnp.take(data, indices, axis=1)  # (batch, nnz, feat)
    return _seg_scan_reduce(
        gathered * weights[:, :, None], indptr, jnp.add, axis=1
    )


def seg_pool(
    data: jax.Array,
    indices: jax.Array,
    indptr: jax.Array,
    pool_type: str = "sum",
) -> jax.Array:
    """Unweighted neighbor pooling: sum / avg / max over each segment.

    Reference: ``SegPoolImpl`` (``seg_op.cc:242-332``; CUDA
    ``SegPoolKernel`` ``seg_op.cu:1057+``).  ``avg`` of an empty segment is
    0; ``max`` of an empty segment is 0.  The max-pool gradient flows to
    an argmax element only, via autodiff of the segmented-scan ``maximum``
    chain (reference does this with explicit argmax index outputs).
    """
    if pool_type not in ("sum", "avg", "max"):
        raise ValueError(f"unknown pool_type: {pool_type!r}")
    seg_len = (indptr[1:] - indptr[:-1]).astype(data.dtype)
    gathered = jnp.take(data, indices, axis=1)  # (batch, nnz, feat)
    if pool_type == "max":
        return _seg_scan_reduce(gathered, indptr, jnp.maximum, axis=1)
    out = _seg_scan_reduce(gathered, indptr, jnp.add, axis=1)
    if pool_type == "avg":
        out = out / jnp.maximum(seg_len, 1.0)[None, :, None]
    return out

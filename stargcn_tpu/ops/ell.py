"""CSR-segment -> ELL conversion and Pallas-backed seg-op variants.

Bridges the reference-shaped CSR segment API (``ops/segment.py``) to the
hand-written Pallas kernels (``ops/pallas_kernels.py``): the ragged
segments are packed host-side into fixed-width (num_seg, K) slot
matrices once per graph, after which ``seg_weighted_pool`` /
``seg_take_k_corr`` run as tiled MXU kernels.  This is the layout the
reference's CUDA kernels impose at runtime via seg-id expansion
(``seg_op.cu:69-110``), done ahead of time instead.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EllSegments:
    """Packed segments: ``slot_edge[i, k]`` is the position (into the
    original nnz axis) of segment i's k-th element; ``slot_mask`` is 0 on
    padding.  ``K`` = max segment length."""

    slot_edge: np.ndarray   # (num_seg, K) int32
    slot_mask: np.ndarray   # (num_seg, K) float32
    num_seg: int
    nnz: int


def ell_from_csr(indptr, nnz=None) -> EllSegments:
    """Pack CSR segments into fixed-width slots (host, once per graph)."""
    indptr = np.asarray(indptr, dtype=np.int64)
    num_seg = indptr.size - 1
    nnz = int(indptr[-1]) if nnz is None else int(nnz)
    deg = indptr[1:] - indptr[:-1]
    K = int(deg.max(initial=1))
    slot_edge = np.zeros((num_seg, K), np.int32)
    slot_mask = np.zeros((num_seg, K), np.float32)
    rows = np.repeat(np.arange(num_seg), deg)
    cols = np.arange(nnz) - np.repeat(indptr[:-1], deg)
    slot_edge[rows, cols] = np.arange(nnz, dtype=np.int32)
    slot_mask[rows, cols] = 1.0
    return EllSegments(slot_edge=slot_edge, slot_mask=slot_mask,
                       num_seg=num_seg, nnz=nnz)


def seg_weighted_pool_pallas(data, weights, indices, ell: EllSegments,
                             interpret=False):
    """Pallas-backed ``seg_weighted_pool`` (same contract as
    ``ops.segment.seg_weighted_pool`` with the indptr pre-packed).

    Args:
      data: ``(batch, num_neighbor_nodes, feat)``.
      weights: ``(batch, nnz)``.
      indices: ``(nnz,)`` indices into data's node axis.
      ell: packed segments from ``ell_from_csr``.
    """
    from stargcn_tpu.ops.pallas_kernels import ell_spmm

    slot_edge = jnp.asarray(ell.slot_edge)
    slot_mask = jnp.asarray(ell.slot_mask)
    nbr = jnp.take(jnp.asarray(indices), slot_edge)        # (S, K)

    def one(data_b, w_b):
        w_ell = jnp.take(w_b, slot_edge) * slot_mask       # (S, K)
        return ell_spmm(data_b, nbr, w_ell, interpret)

    return jax.vmap(one)(data, weights)


def seg_take_k_corr_pallas(embed1, embed2, neighbor_ids, ell: EllSegments,
                           interpret=False):
    """Pallas-backed ``seg_take_k_corr``: returns the per-edge scores in
    the original nnz order (scatter-free unpack via the slot map)."""
    from stargcn_tpu.ops.pallas_kernels import ell_sddmm

    slot_edge = jnp.asarray(ell.slot_edge)
    slot_mask = jnp.asarray(ell.slot_mask)
    nbr = jnp.take(jnp.asarray(neighbor_ids), slot_edge)   # (S, K)

    def one(e1_k, e2_k):
        scores = ell_sddmm(e1_k, e2_k, nbr, interpret=interpret)  # (S, K)
        flat = jnp.zeros((ell.nnz,), scores.dtype)
        return flat.at[slot_edge.reshape(-1)].add(
            (scores * slot_mask).reshape(-1))

    return jax.vmap(one)(embed1, embed2)

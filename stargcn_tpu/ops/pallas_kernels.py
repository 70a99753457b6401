"""Pallas TPU kernels for neighbor aggregation over fixed-fanout (ELL)
adjacency.

These are the hand-written-kernel tier of the framework — the TPU
equivalent of the reference's CUDA seg_ops (``seg_ops_cuda/mxnet_op/
seg_op.cu``): ``ell_spmm`` plays the role of the gather-accumulate
``SegTakeKCorrBackwardEmbed1Kernel`` (``seg_op.cu:682-722``, the forward
of ``seg_weighted_pool``), ``ell_sddmm`` the tiled SDDMM
``SegTakeKCorrKernel`` (``seg_op.cu:573-664``), and ``ell_spmm_transpose``
the sort-based scatter ``SegTakeKCorrBackwardEmbed2Kernel``
(``seg_op.cu:747-790``).  As in the reference's gradient registration
(``seg_op.cc:647-712``), the three are wired as each other's adjoints via
``custom_vjp``.

Layout: instead of the reference's ragged CSR segments, adjacency is a
dense ``(num_dst, K)`` neighbor-index matrix + weight matrix, padded with
``weight == 0`` slots (the TPU-first static-shape design — SURVEY.md §7
"hard parts": CSR -> padded-ELL).  This is the natural layout for the
fixed-fanout sampled mini-batch mode (``GRAPH_SAMPLER.NUM_NEIGHBORS``).

Kernel strategy: TPUs have no fast scatter/atomics, so both the gather
and its transpose are expressed as ONE-HOT MATMULS on the MXU — each
(dst-tile, src-chunk) step builds the 0/1 incidence tile in registers
from the index tile and contracts it with the value chunk.  The grid's
innermost dimension walks src chunks sequentially (TPU grid steps are
sequential on a core), accumulating into the output tile in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _pad_dim(x, axis, multiple, fill=0):
    size = x.shape[axis]
    target = _cdiv(size, multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=fill)


# --------------------------------- SpMM ---------------------------------


def _multi_hot(idx_ref, w_ref, chunk_start, bs):
    """Weighted multi-hot incidence tile M (BD, BS):
    ``M[d, s] = sum_k w[d, k] * [idx[d, k] - chunk_start == s]``.

    Built with K compare/select accumulation passes on the VPU — one
    column slice per fanout slot, no reshapes (Mosaic-friendly) — so the
    contraction itself is a single MXU matmul per tile instead of the
    (BD*K)-row one-hot variant (K x fewer flops).
    """
    idx = idx_ref[:]                    # (BD, K) int32 (global src index)
    w = w_ref[:]                        # (BD, K) f32
    bd, k = idx.shape
    local = idx - chunk_start           # src index relative to this chunk
    cols = jax.lax.broadcasted_iota(jnp.int32, (bd, bs), 1)
    m = jnp.zeros((bd, bs), jnp.float32)
    for kk in range(k):
        lk = jax.lax.slice(local, (0, kk), (bd, kk + 1))      # (BD, 1)
        wk = jax.lax.slice(w, (0, kk), (bd, kk + 1))          # (BD, 1)
        m = m + jnp.where(cols == lk, wk, 0.0)  # out-of-range never matches
    return m


def _spmm_kernel(idx_ref, w_ref, val_ref, out_ref, *, block_s,
                 precision):
    """out[bd, f] += sum_k w[bd, k] * val[idx[bd, k] - chunk_start, f]."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    vals = val_ref[:]                   # (BS, BF)
    m = _multi_hot(idx_ref, w_ref, s * block_s, vals.shape[0])
    out_ref[:] += jax.lax.dot(m, vals, precision=precision,
                              preferred_element_type=jnp.float32)


def ell_spmm_fwd_only(values, nbr_idx, nbr_weight, *, block_d=256,
                      block_f=256, block_s=512, interpret=False,
                      precision=None):
    """``out[i] = sum_k nbr_weight[i,k] * values[nbr_idx[i,k]]`` (no vjp).

    Args:
      values: ``(num_src, feat)`` f32.
      nbr_idx: ``(num_dst, K)`` int32, padded slots may hold any index.
      nbr_weight: ``(num_dst, K)`` f32, 0 on padded slots.
    """
    num_dst, K = nbr_idx.shape
    num_src, feat = values.shape
    block_d = min(block_d, max(8, num_dst))
    block_f = min(block_f, max(128, feat))
    block_s = min(block_s, max(128, num_src))

    v = _pad_dim(_pad_dim(values, 0, block_s), 1, block_f)
    idx = _pad_dim(nbr_idx, 0, block_d)
    w = _pad_dim(nbr_weight, 0, block_d)
    D_p, S_p, F_p = idx.shape[0], v.shape[0], v.shape[1]

    grid = (D_p // block_d, F_p // block_f, S_p // block_s)
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, block_s=block_s,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_d, K), lambda d, f, s: (d, 0)),
            pl.BlockSpec((block_d, K), lambda d, f, s: (d, 0)),
            pl.BlockSpec((block_s, block_f), lambda d, f, s: (s, f)),
        ],
        out_specs=pl.BlockSpec((block_d, block_f), lambda d, f, s: (d, f)),
        out_shape=jax.ShapeDtypeStruct((D_p, F_p), jnp.float32),
        interpret=interpret,
    )(idx, w, v)
    return out[:num_dst, :feat]


# -------------------------------- SDDMM ---------------------------------


def _sddmm_kernel(idx_ref, q_ref, val_ref, out_ref, *, block_s,
                  precision):
    """out[bd, k] += dot(q[bd, :], val[idx[bd, k] - chunk_start, :]).

    One MXU contraction ``G = q @ vals^T`` per (dst-tile, src-chunk),
    then K select-reduce passes pick each slot's score from G — the
    in-register analogue of the reference's shared-memory SDDMM tiling
    (``seg_op.cu:573-664``) without dynamic gathers.
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]                    # (BD, K)
    q = q_ref[:]                        # (BD, F)
    vals = val_ref[:]                   # (BS, F)
    bd, k = idx.shape
    bs = vals.shape[0]
    local = idx - s * block_s
    # G[d, s] = q[d] . vals[s]   (contract the feature dim, no transpose)
    g = jax.lax.dot_general(
        q, vals, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)                  # (BD, BS)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bd, bs), 1)
    scores = []
    for kk in range(k):
        lk = jax.lax.slice(local, (0, kk), (bd, kk + 1))      # (BD, 1)
        score_k = jnp.sum(jnp.where(cols == lk, g, 0.0), axis=1,
                          keepdims=True)                      # (BD, 1)
        scores.append(score_k)
    out_ref[:] += jnp.concatenate(scores, axis=1)


def ell_sddmm(queries, values, nbr_idx, *, block_d=256, block_s=512,
              interpret=False, precision=None):
    """``out[i, k] = dot(queries[i], values[nbr_idx[i, k]])``.

    The ELL analogue of ``seg_take_k_corr`` (``seg_op.cc:150-178``).
    """
    num_dst, K = nbr_idx.shape
    num_src, feat = values.shape
    block_d = min(block_d, max(8, num_dst))
    block_s = min(block_s, max(128, num_src))

    q = _pad_dim(queries, 0, block_d)
    v = _pad_dim(values, 0, block_s)
    idx = _pad_dim(nbr_idx, 0, block_d)
    D_p, S_p = idx.shape[0], v.shape[0]

    grid = (D_p // block_d, S_p // block_s)
    out = pl.pallas_call(
        functools.partial(_sddmm_kernel, block_s=block_s,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_d, K), lambda d, s: (d, 0)),
            pl.BlockSpec((block_d, feat), lambda d, s: (d, 0)),
            pl.BlockSpec((block_s, feat), lambda d, s: (s, 0)),
        ],
        out_specs=pl.BlockSpec((block_d, K), lambda d, s: (d, 0)),
        out_shape=jax.ShapeDtypeStruct((D_p, K), jnp.float32),
        interpret=interpret,
    )(idx, q, v)
    return out[:num_dst]


# --------------------------- transpose SpMM ------------------------------


def _spmm_t_kernel(idx_ref, w_ref, g_ref, out_ref, *, block_s,
                   precision):
    """out[s, f] += sum_{(d,k): idx[d,k]==s} w[d,k] * g[d, f] — M^T @ g."""
    d = pl.program_id(2)

    @pl.when(d == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g = g_ref[:]                        # (BD, BF) cotangent rows
    s = pl.program_id(0)
    m = _multi_hot(idx_ref, w_ref, s * block_s, out_ref.shape[0])
    # contract the BD dim: out[s, f] = sum_d m[d, s] * g[d, f]
    out_ref[:] += jax.lax.dot_general(
        m, g, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)


def ell_spmm_transpose(cotangent, nbr_idx, nbr_weight, num_src, *,
                       block_d=256, block_f=256, block_s=512,
                       interpret=False, precision=None):
    """``d_values[s] = sum_{(i,k): idx[i,k]==s} w[i,k] * cotangent[i]``.

    The scatter adjoint of ``ell_spmm`` — role of the reference's
    radix-sort + run-length scatter backward (``seg_op.cu:747-790``),
    expressed as a transposed one-hot matmul (TPUs lack fast atomics;
    SURVEY.md §7 "gradient of scatter ... one-hot-matmul formulation").
    """
    num_dst, K = nbr_idx.shape
    feat = cotangent.shape[1]
    block_d = min(block_d, max(8, num_dst))
    block_f = min(block_f, max(128, feat))
    block_s = min(block_s, max(128, num_src))

    g = _pad_dim(_pad_dim(cotangent, 0, block_d), 1, block_f)
    idx = _pad_dim(nbr_idx, 0, block_d)
    w = _pad_dim(nbr_weight, 0, block_d)
    D_p = idx.shape[0]
    S_p = _cdiv(num_src, block_s) * block_s
    F_p = g.shape[1]

    grid = (S_p // block_s, F_p // block_f, D_p // block_d)
    out = pl.pallas_call(
        functools.partial(_spmm_t_kernel, block_s=block_s,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_d, K), lambda s, f, d: (d, 0)),
            pl.BlockSpec((block_d, K), lambda s, f, d: (d, 0)),
            pl.BlockSpec((block_d, block_f), lambda s, f, d: (d, f)),
        ],
        out_specs=pl.BlockSpec((block_s, block_f), lambda s, f, d: (s, f)),
        out_shape=jax.ShapeDtypeStruct((S_p, F_p), jnp.float32),
        interpret=interpret,
    )(idx, w, g)
    return out[:num_src, :feat]


# ---------------------------- differentiable op ---------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ell_spmm(values, nbr_idx, nbr_weight, interpret=False):
    """Differentiable fixed-fanout weighted neighbor aggregation.

    Adjoint wiring mirrors the reference gradient graph
    (``seg_op.cc:700-712``): d_values = transpose-scatter of the
    weighted cotangent; d_weights = SDDMM(cotangent, values).
    """
    return ell_spmm_fwd_only(values, nbr_idx, nbr_weight,
                             interpret=interpret)


def _ell_spmm_fwd(values, nbr_idx, nbr_weight, interpret):
    out = ell_spmm_fwd_only(values, nbr_idx, nbr_weight,
                            interpret=interpret)
    return out, (values, nbr_idx, nbr_weight)


def _ell_spmm_bwd(interpret, residuals, cotangent):
    values, nbr_idx, nbr_weight = residuals
    d_values = ell_spmm_transpose(cotangent, nbr_idx, nbr_weight,
                                  values.shape[0], interpret=interpret)
    d_weight = ell_sddmm(cotangent, values, nbr_idx, interpret=interpret)
    return d_values, None, d_weight


ell_spmm.defvjp(_ell_spmm_fwd, _ell_spmm_bwd)


# ----------------------------- numpy reference ----------------------------


def ref_ell_spmm(values, nbr_idx, nbr_weight):
    """Pure-numpy golden model (test pattern of ``test_seg_ops.py``)."""
    import numpy as np

    num_dst, K = nbr_idx.shape
    out = np.zeros((num_dst, values.shape[1]), np.float32)
    for i in range(num_dst):
        for k in range(K):
            out[i] += nbr_weight[i, k] * values[nbr_idx[i, k]]
    return out


def ref_ell_sddmm(queries, values, nbr_idx):
    import numpy as np

    num_dst, K = nbr_idx.shape
    out = np.zeros((num_dst, K), np.float32)
    for i in range(num_dst):
        for k in range(K):
            out[i, k] = queries[i] @ values[nbr_idx[i, k]]
    return out

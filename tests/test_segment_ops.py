"""Segment-op unit tests: pure-numpy goldens vs the JAX/XLA ops.

Mirrors the reference test strategy (``seg_ops_cuda/mxnet_op/test_seg_ops.py``):
each op is checked against an independent numpy model over shape sweeps,
and gradients are verified with ``jax.test_util.check_grads`` (replacing
the reference's central finite differences through a bound executor).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from stargcn_tpu.ops import (
    seg_broadcast_add,
    seg_broadcast_mul,
    seg_broadcast_to,
    seg_max,
    seg_min,
    seg_pool,
    seg_softmax,
    seg_sum,
    seg_take_k_corr,
    seg_weighted_pool,
)

SHAPES = [(1, 5, 10), (4, 17, 101), (2, 100, 1000)]


def rand_indptr(rng, seg_num, nnz):
    cuts = np.sort(rng.choice(np.arange(1, nnz), seg_num - 1, replace=False))
    return np.concatenate([[0], cuts, [nnz]]).astype(np.int32)


# ---- numpy goldens (independent reimplementation of the op contracts) ----

def npy_seg_sum(data, indptr):
    out = np.zeros(data.shape[:-1] + (len(indptr) - 1,), np.float32)
    for i in range(len(indptr) - 1):
        out[..., i] = data[..., indptr[i]:indptr[i + 1]].sum(axis=-1)
    return out


def npy_seg_reduce(data, indptr, fn):
    out = np.zeros(data.shape[:-1] + (len(indptr) - 1,), np.float32)
    for i in range(len(indptr) - 1):
        if indptr[i + 1] > indptr[i]:
            out[..., i] = fn(data[..., indptr[i]:indptr[i + 1]], -1)
    return out


def npy_seg_broadcast_to(rhs, indptr, nnz):
    out = np.zeros(rhs.shape[:-1] + (nnz,), np.float32)
    for i in range(len(indptr) - 1):
        out[..., indptr[i]:indptr[i + 1]] = rhs[..., i:i + 1]
    return out


def npy_seg_softmax(data, indptr):
    out = np.zeros_like(data)
    for i in range(len(indptr) - 1):
        seg = data[..., indptr[i]:indptr[i + 1]]
        if seg.shape[-1]:
            e = np.exp(seg - seg.max(axis=-1, keepdims=True))
            out[..., indptr[i]:indptr[i + 1]] = e / e.sum(-1, keepdims=True)
    return out


def npy_seg_take_k_corr(e1, e2, nids, indptr):
    K, _, _ = e1.shape
    nnz = len(nids)
    out = np.zeros((K, nnz), np.float32)
    for k in range(K):
        for i in range(len(indptr) - 1):
            for j in range(indptr[i], indptr[i + 1]):
                out[k, j] = (e1[k, i] * e2[k, nids[j]]).sum()
    return out


def npy_seg_weighted_pool(data, weights, indices, indptr):
    B, _, F = data.shape
    S = len(indptr) - 1
    out = np.zeros((B, S, F), np.float32)
    for b in range(B):
        for i in range(S):
            sl = slice(indptr[i], indptr[i + 1])
            out[b, i] = (
                weights[b, sl][:, None] * data[b, indices[sl]]
            ).sum(axis=0)
    return out


def npy_seg_pool(data, indices, indptr, pool_type):
    B, _, F = data.shape
    S = len(indptr) - 1
    out = np.zeros((B, S, F), np.float32)
    for i in range(S):
        sl = indices[indptr[i]:indptr[i + 1]]
        if len(sl) == 0:
            continue
        if pool_type == "sum":
            out[:, i] = data[:, sl].sum(axis=1)
        elif pool_type == "avg":
            out[:, i] = data[:, sl].mean(axis=1)
        elif pool_type == "max":
            out[:, i] = data[:, sl].max(axis=1)
    return out


# ---------------------------- tests ----------------------------


@pytest.mark.parametrize("shape", SHAPES)
def test_seg_sum(rng, shape):
    b, s, nnz = shape
    data = rng.normal(size=(b, nnz)).astype(np.float32)
    indptr = rand_indptr(rng, s, nnz)
    got = seg_sum(jnp.asarray(data), jnp.asarray(indptr))
    np.testing.assert_allclose(got, npy_seg_sum(data, indptr), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_seg_max_min(rng, shape):
    b, s, nnz = shape
    data = rng.normal(size=(b, nnz)).astype(np.float32)
    indptr = rand_indptr(rng, s, nnz)
    np.testing.assert_allclose(
        seg_max(jnp.asarray(data), jnp.asarray(indptr)),
        npy_seg_reduce(data, indptr, np.ndarray.max), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        seg_min(jnp.asarray(data), jnp.asarray(indptr)),
        npy_seg_reduce(data, indptr, np.ndarray.min), rtol=1e-5, atol=1e-5)


def test_seg_reduce_empty_segments():
    data = jnp.asarray([[1.0, 2.0, 3.0]])
    indptr = jnp.asarray([0, 0, 2, 2, 3], jnp.int32)
    np.testing.assert_allclose(seg_sum(data, indptr), [[0, 3, 0, 3]])
    np.testing.assert_allclose(seg_max(data, indptr), [[0, 2, 0, 3]])
    np.testing.assert_allclose(seg_min(data, indptr), [[0, 1, 0, 3]])


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_seg_broadcast(rng, shape):
    b, s, nnz = shape
    lhs = rng.normal(size=(b, nnz)).astype(np.float32)
    rhs = rng.normal(size=(b, s)).astype(np.float32)
    indptr = rand_indptr(rng, s, nnz)
    bt = npy_seg_broadcast_to(rhs, indptr, nnz)
    np.testing.assert_allclose(
        seg_broadcast_to(jnp.asarray(rhs), jnp.asarray(indptr), nnz), bt,
        rtol=1e-5)
    np.testing.assert_allclose(
        seg_broadcast_add(jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(indptr)),
        lhs + bt, rtol=1e-5)
    np.testing.assert_allclose(
        seg_broadcast_mul(jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(indptr)),
        lhs * bt, rtol=1e-5)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_seg_softmax(rng, shape):
    b, s, nnz = shape
    data = rng.normal(size=(b, nnz)).astype(np.float32)
    indptr = rand_indptr(rng, s, nnz)
    got = seg_softmax(jnp.asarray(data), jnp.asarray(indptr))
    np.testing.assert_allclose(got, npy_seg_softmax(data, indptr), rtol=1e-4,
                               atol=1e-5)


def test_seg_take_k_corr(rng):
    K, n_node, n_nbr, F, nnz = 3, 11, 17, 8, 40
    e1 = rng.normal(size=(K, n_node, F)).astype(np.float32)
    e2 = rng.normal(size=(K, n_nbr, F)).astype(np.float32)
    nids = rng.randint(0, n_nbr, size=nnz).astype(np.int32)
    indptr = rand_indptr(rng, n_node, nnz)
    got = seg_take_k_corr(jnp.asarray(e1), jnp.asarray(e2),
                          jnp.asarray(nids), jnp.asarray(indptr))
    np.testing.assert_allclose(got, npy_seg_take_k_corr(e1, e2, nids, indptr),
                               rtol=1e-4, atol=1e-4)


def test_seg_weighted_pool(rng):
    B, n_nbr, F, S, nnz = 2, 23, 16, 9, 50
    data = rng.normal(size=(B, n_nbr, F)).astype(np.float32)
    w = rng.normal(size=(B, nnz)).astype(np.float32)
    idx = rng.randint(0, n_nbr, size=nnz).astype(np.int32)
    indptr = rand_indptr(rng, S, nnz)
    got = seg_weighted_pool(jnp.asarray(data), jnp.asarray(w),
                            jnp.asarray(idx), jnp.asarray(indptr))
    np.testing.assert_allclose(got, npy_seg_weighted_pool(data, w, idx, indptr),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pool_type", ["sum", "avg", "max"])
def test_seg_pool(rng, pool_type):
    B, n_nbr, F, S, nnz = 2, 23, 4, 9, 50
    data = rng.normal(size=(B, n_nbr, F)).astype(np.float32)
    idx = rng.randint(0, n_nbr, size=nnz).astype(np.int32)
    indptr = rand_indptr(rng, S, nnz)
    got = seg_pool(jnp.asarray(data), jnp.asarray(idx), jnp.asarray(indptr),
                   pool_type)
    np.testing.assert_allclose(got, npy_seg_pool(data, idx, indptr, pool_type),
                               rtol=1e-4, atol=1e-4)


# -------- gradients (replaces the reference finite-difference checks) ----


def test_grad_seg_sum_softmax(rng):
    data = jnp.asarray(rng.normal(size=(2, 30)).astype(np.float32))
    indptr = jnp.asarray(rand_indptr(rng, 7, 30))
    check_grads(lambda d: seg_sum(d, indptr), (data,), order=1, modes=["rev"],
                rtol=1e-3)
    check_grads(lambda d: seg_softmax(d, indptr), (data,), order=1,
                modes=["rev"], rtol=2e-3)


def test_grad_seg_weighted_pool_and_corr(rng):
    B, n_nbr, F, S, nnz = 2, 13, 5, 6, 25
    data = jnp.asarray(rng.normal(size=(B, n_nbr, F)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(B, nnz)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n_nbr, size=nnz).astype(np.int32))
    indptr = jnp.asarray(rand_indptr(rng, S, nnz))
    check_grads(lambda d, ww: seg_weighted_pool(d, ww, idx, indptr),
                (data, w), order=1, modes=["rev"], rtol=1e-3)

    K = 2
    e1 = jnp.asarray(rng.normal(size=(K, S, F)).astype(np.float32))
    e2 = jnp.asarray(rng.normal(size=(K, n_nbr, F)).astype(np.float32))
    indptr2 = jnp.asarray(rand_indptr(rng, S, nnz))
    check_grads(lambda a, b: seg_take_k_corr(a, b, idx, indptr2),
                (e1, e2), order=1, modes=["rev"], rtol=1e-3)


def test_adjoint_structure(rng):
    """seg_weighted_pool / seg_take_k_corr are each other's adjoints.

    The reference encodes this as an explicit NNVM gradient graph
    (``seg_op.cc:647-712``); here we verify JAX autodiff reproduces it:
    d(pool)/d(weights) contracted with a cotangent equals the SDDMM of the
    cotangent against the data.
    """
    B, n_nbr, F, S, nnz = 1, 7, 3, 4, 12
    data = rng.normal(size=(B, n_nbr, F)).astype(np.float32)
    w = rng.normal(size=(B, nnz)).astype(np.float32)
    idx = rng.randint(0, n_nbr, size=nnz).astype(np.int32)
    indptr = rand_indptr(rng, S, nnz)
    ct = rng.normal(size=(B, S, F)).astype(np.float32)

    _, vjp = jax.vjp(
        lambda ww: seg_weighted_pool(jnp.asarray(data), ww, jnp.asarray(idx),
                                     jnp.asarray(indptr)), jnp.asarray(w))
    dw = vjp(jnp.asarray(ct))[0]
    sddmm = seg_take_k_corr(jnp.asarray(ct), jnp.asarray(data),
                            jnp.asarray(idx), jnp.asarray(indptr))
    np.testing.assert_allclose(dw, sddmm, rtol=1e-4, atol=1e-5)

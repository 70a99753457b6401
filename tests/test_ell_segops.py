"""Pallas-backed seg-op variants vs the XLA reference ops."""

import jax
import jax.numpy as jnp
import numpy as np

from stargcn_tpu.ops import seg_take_k_corr, seg_weighted_pool
from stargcn_tpu.ops.ell import (
    ell_from_csr,
    seg_take_k_corr_pallas,
    seg_weighted_pool_pallas,
)

INTERP = jax.default_backend() == "cpu"


def rand_indptr(rng, seg_num, nnz):
    cuts = np.sort(rng.choice(np.arange(1, nnz), seg_num - 1, replace=False))
    return np.concatenate([[0], cuts, [nnz]]).astype(np.int32)


def test_ell_from_csr_roundtrip(rng):
    indptr = rand_indptr(rng, 9, 40)
    ell = ell_from_csr(indptr)
    # every edge appears exactly once where mask is set
    edges = ell.slot_edge[ell.slot_mask > 0]
    np.testing.assert_array_equal(np.sort(edges), np.arange(40))


def test_seg_weighted_pool_pallas_matches(rng):
    B, n_nbr, F, S, nnz = 2, 23, 16, 9, 50
    data = rng.normal(size=(B, n_nbr, F)).astype(np.float32)
    w = rng.normal(size=(B, nnz)).astype(np.float32)
    idx = rng.randint(0, n_nbr, size=nnz).astype(np.int32)
    indptr = rand_indptr(rng, S, nnz)
    want = seg_weighted_pool(jnp.asarray(data), jnp.asarray(w),
                             jnp.asarray(idx), jnp.asarray(indptr))
    ell = ell_from_csr(indptr)
    got = seg_weighted_pool_pallas(jnp.asarray(data), jnp.asarray(w),
                                   idx, ell, interpret=INTERP)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_seg_take_k_corr_pallas_matches(rng):
    K_, n_node, n_nbr, F, nnz = 2, 11, 17, 8, 40
    e1 = rng.normal(size=(K_, n_node, F)).astype(np.float32)
    e2 = rng.normal(size=(K_, n_nbr, F)).astype(np.float32)
    nids = rng.randint(0, n_nbr, size=nnz).astype(np.int32)
    indptr = rand_indptr(rng, n_node, nnz)
    want = seg_take_k_corr(jnp.asarray(e1), jnp.asarray(e2),
                           jnp.asarray(nids), jnp.asarray(indptr))
    ell = ell_from_csr(indptr)
    got = seg_take_k_corr_pallas(jnp.asarray(e1), jnp.asarray(e2), nids,
                                 ell, interpret=INTERP)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

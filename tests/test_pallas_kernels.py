"""Pallas ELL kernel tests (interpret mode on CPU; numerics vs numpy
goldens + adjoint wiring via finite-difference-free vjp checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.ops.pallas_kernels import (
    ell_sddmm,
    ell_spmm,
    ell_spmm_fwd_only,
    ell_spmm_transpose,
    ref_ell_sddmm,
    ref_ell_spmm,
)

INTERP = jax.default_backend() == "cpu"


def make_ell(rng, num_dst=50, num_src=70, K=9, feat=33, pad_frac=0.3):
    idx = rng.randint(0, num_src, size=(num_dst, K)).astype(np.int32)
    w = rng.normal(size=(num_dst, K)).astype(np.float32)
    pad = rng.uniform(size=(num_dst, K)) < pad_frac
    w[pad] = 0.0
    vals = rng.normal(size=(num_src, feat)).astype(np.float32)
    return vals, idx, w


def test_spmm_matches_golden(rng):
    vals, idx, w = make_ell(rng)
    got = ell_spmm_fwd_only(jnp.asarray(vals), jnp.asarray(idx),
                            jnp.asarray(w), interpret=INTERP,
                            block_d=16, block_f=128, block_s=32)
    np.testing.assert_allclose(got, ref_ell_spmm(vals, idx, w),
                               rtol=1e-4, atol=1e-4)


def test_spmm_multi_chunk_blocks(rng):
    vals, idx, w = make_ell(rng, num_dst=130, num_src=300, K=4, feat=140)
    got = ell_spmm_fwd_only(jnp.asarray(vals), jnp.asarray(idx),
                            jnp.asarray(w), interpret=INTERP,
                            block_d=64, block_f=128, block_s=128)
    np.testing.assert_allclose(got, ref_ell_spmm(vals, idx, w),
                               rtol=1e-4, atol=1e-4)


def test_sddmm_matches_golden(rng):
    vals, idx, w = make_ell(rng, feat=16)
    q = rng.normal(size=(idx.shape[0], 16)).astype(np.float32)
    got = ell_sddmm(jnp.asarray(q), jnp.asarray(vals), jnp.asarray(idx),
                    interpret=INTERP, block_d=16, block_s=32)
    np.testing.assert_allclose(got, ref_ell_sddmm(q, vals, idx),
                               rtol=1e-4, atol=1e-4)


def test_spmm_transpose_matches_scatter(rng):
    vals, idx, w = make_ell(rng, num_dst=40, num_src=60, K=5, feat=24)
    ct = rng.normal(size=(40, 24)).astype(np.float32)
    got = ell_spmm_transpose(jnp.asarray(ct), jnp.asarray(idx),
                             jnp.asarray(w), 60, interpret=INTERP,
                             block_d=16, block_f=128, block_s=32)
    want = np.zeros((60, 24), np.float32)
    for i in range(40):
        for k in range(5):
            want[idx[i, k]] += w[i, k] * ct[i]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_custom_vjp_adjoints(rng):
    """d_values/d_weights from the paired kernels match JAX autodiff of
    an equivalent XLA formulation."""
    vals, idx, w = make_ell(rng, num_dst=30, num_src=40, K=4, feat=18)
    ct = rng.normal(size=(30, 18)).astype(np.float32)

    def xla_spmm(v, ww):
        return (v[idx] * ww[:, :, None]).sum(axis=1)

    out_ref, vjp_ref = jax.vjp(xla_spmm, jnp.asarray(vals), jnp.asarray(w))
    dv_ref, dw_ref = vjp_ref(jnp.asarray(ct))

    out, vjp = jax.vjp(
        lambda v, ww: ell_spmm(v, jnp.asarray(idx), ww, INTERP),
        jnp.asarray(vals), jnp.asarray(w))
    dv, dw = vjp(jnp.asarray(ct))

    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dv, dv_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dw, dw_ref, rtol=1e-4, atol=1e-4)

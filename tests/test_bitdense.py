"""Bit-packed dense aggregation (ops/bitdense.py) correctness.

Pattern per SURVEY.md §4: pure-numpy goldens vs the kernels (Pallas in
interpret mode on CPU; the XLA fallback directly), plus gradient checks
through the custom_vjp against an explicit dense one-hot formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.ops import bitdense as bd


def _random_edges(rng, num_dst, num_src, num_edges, R):
    dst = rng.randint(0, num_dst, num_edges).astype(np.int32)
    src = rng.randint(0, num_src, num_edges).astype(np.int32)
    rat = rng.randint(0, R, num_edges).astype(np.int32)
    # dedup (d, s, r) triples: one-hot semantics make duplicates collapse,
    # while a plain segment-sum would double-count — keep the comparison
    # well-defined.
    flat = (dst.astype(np.int64) * num_src + src) * R + rat
    _, keep = np.unique(flat, return_index=True)
    return dst[keep], src[keep], rat[keep]


def _dense_onehot(dst, src, rat, R, num_dst, num_src):
    S = np.zeros((R, num_dst, num_src), np.float32)
    S[rat, dst, src] = 1.0
    return S


class TestPackBits:
    def test_pack_matches_bruteforce(self, rng):
        R, D, S_n = 3, 37, 23
        dst, src, rat = _random_edges(rng, D, S_n, 200, R)
        P, d8 = bd.pack_bits(dst, src, rat, R, D, S_n)
        S = _dense_onehot(dst, src, rat, R, D, S_n)
        for r in range(R):
            for d in range(D):
                b, m = d // d8, d % d8
                row = np.asarray(P[r * d8 + m])
                got = (row >> b) & 1
                np.testing.assert_array_equal(
                    got[:S_n], S[r, d].astype(np.uint8),
                    err_msg=f"r={r} d={d}")

    def test_mask_filters_edges(self, rng):
        R, D, S_n = 2, 20, 15
        dst, src, rat = _random_edges(rng, D, S_n, 80, R)
        mask = rng.rand(dst.size) > 0.5
        P, d8 = bd.pack_bits(dst, src, rat, R, D, S_n,
                             mask=mask.astype(np.float32))
        P_ref, _ = bd.pack_bits(dst[mask], src[mask], rat[mask], R, D, S_n)
        np.testing.assert_array_equal(np.asarray(P), np.asarray(P_ref))


class TestKernels:
    @pytest.mark.parametrize("R", [1, 3])
    def test_expand_golden(self, rng, R):
        D, S_n, F = 29, 17, 7
        dst, src, rat = _random_edges(rng, D, S_n, 150, R)
        P, d8 = bd.pack_bits(dst, src, rat, R, D, S_n)
        s_pad = P.shape[1]
        x = rng.randn(s_pad, F).astype(np.float32)
        golden = bd.ref_bit_pool(x, np.asarray(P), R, d8)
        xla = bd.xla_expand_matmul(jnp.asarray(P), jnp.asarray(x), R, d8)
        xla = np.asarray(xla).transpose(1, 2, 0, 3).reshape(8 * d8, R, F)
        np.testing.assert_allclose(xla, golden, rtol=1e-5, atol=1e-5)
        pallas = bd.bit_expand_matmul(jnp.asarray(P), jnp.asarray(x), R,
                                      d8, interpret=True)
        pallas = np.asarray(pallas).transpose(1, 2, 0, 3).reshape(
            8 * d8, R, F)
        # x is cast to bf16 inside the kernel; compare accordingly.
        golden_bf16 = bd.ref_bit_pool(
            np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(
                jnp.float32)), np.asarray(P), R, d8)
        np.testing.assert_allclose(pallas, golden_bf16, rtol=1e-5,
                                   atol=1e-5)

    def test_reduce_golden(self, rng):
        R, D, S_n, F = 2, 21, 13, 5
        dst, src, rat = _random_edges(rng, D, S_n, 90, R)
        # Transpose layout: src packed, dst in lanes.
        P, s8 = bd.pack_bits(src, dst, rat, R, S_n, D)
        d_pad = P.shape[1]
        g = rng.randn(d_pad, R, F).astype(np.float32)
        S = _dense_onehot(dst, src, rat, R, D, S_n)
        want = np.einsum("rds,drf->sf", S, g[:D])
        xla = np.asarray(bd.xla_reduce_matmul(
            jnp.asarray(P), jnp.asarray(g), R, s8))
        got = xla.reshape(8 * s8, F)[:S_n]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        pal = np.asarray(bd.bit_reduce_matmul(
            jnp.asarray(P), jnp.asarray(g), R, s8, interpret=True))
        g_bf = np.asarray(jnp.asarray(g).astype(jnp.bfloat16).astype(
            jnp.float32))
        want_bf = np.einsum("rds,drf->sf", S, g_bf[:D])
        np.testing.assert_allclose(pal.reshape(8 * s8, F)[:S_n], want_bf,
                                   rtol=1e-4, atol=1e-4)


class TestPoolVjp:
    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_value_and_grad_vs_dense(self, rng, impl):
        R, D, S_n, F = 3, 26, 19, 6
        dst, src, rat = _random_edges(rng, D, S_n, 120, R)
        pa, d8_d = bd.pack_bits(dst, src, rat, R, D, S_n)
        pb, d8_s = bd.pack_bits(src, dst, rat, R, S_n, D)
        s_pad = pa.shape[1]
        x = rng.randn(s_pad, F).astype(np.float32)
        x[S_n:] = 0.0
        S = _dense_onehot(dst, src, rat, R, D, S_n)
        interpret = impl == "pallas"

        def via_bits(xx):
            out = bd.bit_pool_rated(xx, jnp.asarray(pa), jnp.asarray(pb),
                                    R, d8_d, d8_s, impl, interpret)
            return (out[:D] ** 2).sum()

        def via_dense(xx):
            pooled = jnp.einsum("rds,sf->drf", jnp.asarray(S), xx[:S_n])
            return (pooled ** 2).sum()

        v_b, g_b = jax.value_and_grad(via_bits)(jnp.asarray(x))
        v_d, g_d = jax.value_and_grad(via_dense)(jnp.asarray(x))
        rtol = 2e-2 if impl == "pallas" else 1e-4  # bf16 contraction
        np.testing.assert_allclose(float(v_b), float(v_d), rtol=rtol)
        np.testing.assert_allclose(np.asarray(g_b)[:S_n],
                                   np.asarray(g_d)[:S_n],
                                   rtol=rtol, atol=1e-3 * abs(float(v_d)))
        # padded-row gradients are exactly zero (no bits set there)
        np.testing.assert_array_equal(np.asarray(g_b)[S_n:], 0.0)

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
        g = rng.randn(R, d_pad, F).astype(np.float32)
        S = _dense_onehot(dst, src, rat, R, D, S_n)
        want = np.einsum("rds,rdf->sf", S, g[:, :D])
        xla = np.asarray(bd.xla_reduce_matmul(
            jnp.asarray(P), jnp.asarray(g), R, s8))
        got = xla.reshape(8 * s8, F)[:S_n]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        pal = np.asarray(bd.bit_reduce_matmul(
            jnp.asarray(P), jnp.asarray(g), R, s8, interpret=True))
        g_bf = np.asarray(jnp.asarray(g).astype(jnp.bfloat16).astype(
            jnp.float32))
        want_bf = np.einsum("rds,rdf->sf", S, g_bf[:, :D])
        np.testing.assert_allclose(pal.reshape(8 * s8, F)[:S_n], want_bf,
                                   rtol=1e-4, atol=1e-4)


class TestPoolVjp:
    @pytest.mark.parametrize("impl", ["xla", "pallas", "pallas16"])
    def test_value_and_grad_vs_dense(self, rng, impl):
        R, D, S_n, F = 3, 26, 19, 6
        dst, src, rat = _random_edges(rng, D, S_n, 120, R)
        ril = bd._BM if impl == "pallas16" else 0
        pa, d8_d = bd.pack_bits(dst, src, rat, R, D, S_n,
                                row_interleave=ril)
        pb, d8_s = bd.pack_bits(src, dst, rat, R, S_n, D,
                                row_interleave=ril)
        s_pad = pa.shape[1]
        x = rng.randn(s_pad, F).astype(np.float32)
        x[S_n:] = 0.0
        S = _dense_onehot(dst, src, rat, R, D, S_n)
        interpret = impl != "xla"

        def via_bits(xx):
            out = bd.bit_pool_rated(xx, jnp.asarray(pa), jnp.asarray(pb),
                                    R, d8_d, d8_s, impl, interpret)
            return (out[:D] ** 2).sum()

        def via_dense(xx):
            pooled = jnp.einsum("rds,sf->drf", jnp.asarray(S), xx[:S_n])
            return (pooled ** 2).sum()

        v_b, g_b = jax.value_and_grad(via_bits)(jnp.asarray(x))
        v_d, g_d = jax.value_and_grad(via_dense)(jnp.asarray(x))
        rtol = 1e-4 if impl == "xla" else 2e-2  # bf16 contraction
        np.testing.assert_allclose(float(v_b), float(v_d), rtol=rtol)
        np.testing.assert_allclose(np.asarray(g_b)[:S_n],
                                   np.asarray(g_d)[:S_n],
                                   rtol=rtol, atol=1e-3 * abs(float(v_d)))
        # padded-row gradients are exactly zero (no bits set there)
        np.testing.assert_array_equal(np.asarray(g_b)[S_n:], 0.0)


class TestModelIntegration:
    def test_model_bitdense_matches_xla(self, rng):
        """Full model forward on the bitdense backend (xla impl, exact
        f32) == the flat-edge reference path, including REMOVE_RATING
        rank-B correction."""
        import dataclasses

        from stargcn_tpu.data.synthetic import synthetic_graph
        from stargcn_tpu.graph.device import BipartiteGraphData
        from stargcn_tpu.models import STARGCN, STARGCNConfig

        nu_n, ni_n, R, E = 22, 17, 3, 120
        g = synthetic_graph(num_users=nu_n, num_items=ni_n, num_edges=E,
                            rating_values=tuple(range(1, R + 1)), seed=5)
        gd = BipartiteGraphData.from_csr(g["user", "movie"],
                                         pad_multiple=32)
        cfg = STARGCNConfig(
            num_users=nu_n, num_items=ni_n, num_links=R, nblocks=2,
            use_dae=True, embed_units=4, agg_units=(6 * R,),
            out_units=(5,), agg_accum="stack", gcn_dropout=0.0,
            gen_rating_mid_map=4)
        B = 8
        pu = jnp.asarray(rng.randint(0, nu_n, B), jnp.int32)
        pi = jnp.asarray(rng.randint(0, ni_n, B), jnp.int32)
        nu_j = jnp.arange(nu_n, dtype=jnp.int32)
        ni_j = jnp.arange(ni_n, dtype=jnp.int32)
        model = STARGCN(cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
            train=False)["params"]
        ref = model.apply({"params": params}, gd, gd.edge_pad_mask, nu_j,
                          ni_j, pu, pi, train=False)["pred_ratings"]

        cfg_b = dataclasses.replace(cfg, backend="bitdense",
                                    bit_impl="xla")
        pack = bd.build_bit_pack(gd.edge_user, gd.edge_item,
                                 gd.edge_rating, gd.edge_pad_mask,
                                 nu_n, ni_n, R)
        du = jax.ops.segment_sum(gd.edge_pad_mask, gd.edge_user,
                                 num_segments=nu_n)
        di = jax.ops.segment_sum(gd.edge_pad_mask, gd.edge_item,
                                 num_segments=ni_n)
        got = STARGCN(cfg_b).apply(
            {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
            ell_pack=pack, variant_degrees=(du, di),
            train=False)["pred_ratings"]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

        # REMOVE_RATING parity: mask on the xla side vs rank-B
        # correction on the bitdense side
        mask = gd.edge_mask_from_pairs(pu, pi, jnp.ones(B),
                                       gd.edge_pad_mask)
        hit_ref = model.apply(
            {"params": params}, gd, mask, nu_j, ni_j, pu, pi,
            train=False)["pred_ratings"]
        eu = np.asarray(gd.edge_user)
        ei = np.asarray(gd.edge_item)
        keys = eu.astype(np.int64) * ni_n + ei
        order = np.argsort(keys, kind="stable")
        q = np.asarray(pu).astype(np.int64) * ni_n + np.asarray(pi)
        pos = np.clip(np.searchsorted(keys[order], q), 0, keys.size - 1)
        pad_np = np.asarray(gd.edge_pad_mask)
        hit = ((keys[order][pos] == q)
               & (pad_np[order][pos] > 0)).astype(np.float32)
        rating = np.asarray(gd.edge_rating)[order][pos].astype(np.int32)
        du2 = jax.ops.segment_sum(mask * gd.edge_pad_mask, gd.edge_user,
                                  num_segments=nu_n)
        di2 = jax.ops.segment_sum(mask * gd.edge_pad_mask, gd.edge_item,
                                  num_segments=ni_n)
        got_rm = STARGCN(cfg_b).apply(
            {"params": params}, gd, gd.edge_pad_mask, nu_j, ni_j, pu, pi,
            ell_pack=pack, variant_degrees=(du2, di2),
            removed_pairs=(pu, pi, jnp.asarray(hit), jnp.asarray(rating)),
            train=False)["pred_ratings"]
        np.testing.assert_allclose(got_rm, hit_ref, rtol=3e-4, atol=3e-4)

    def test_trainer_bitdense_end_to_end(self, tmp_path):
        """Trainer.fit with backend='bitdense' trains and evaluates
        (exercises _LazyBitPacks + the removal correction in training)."""
        from stargcn_tpu.data.iterators import DataIterator
        from stargcn_tpu.data.synthetic import synthetic_graph
        from stargcn_tpu.models import STARGCNConfig
        from stargcn_tpu.train.loop import Trainer, TrainSettings

        g = synthetic_graph(num_users=20, num_items=15, num_edges=200,
                            seed=7)
        csr = g["user", "movie"]
        pairs = csr.node_pair_ids
        rng = np.random.RandomState(0)
        perm = rng.permutation(pairs.shape[1])
        it = DataIterator(g, "user", "movie",
                          test_node_pairs=pairs[:, perm[:30]],
                          valid_node_pairs=pairs[:, perm[30:60]],
                          embed_P_mask=0.2, seed=0,
                          embed_p_zero=1.0, embed_p_self=0.0)
        cfg = STARGCNConfig(
            num_users=20, num_items=15, num_links=len(csr.multi_link),
            nblocks=2, use_dae=True, embed_units=4, agg_units=(10,),
            out_units=(5,), agg_accum="sum", gcn_dropout=0.1,
            gen_rating_mid_map=4, backend="bitdense", bit_impl="xla")
        s = TrainSettings(rating_batch_size=32, max_iter=6,
                          log_interval=3, valid_interval=3, lr=1e-2,
                          seed=0)
        tr = Trainer(cfg, it, s, save_dir=str(tmp_path))
        result = tr.fit()
        assert np.isfinite(result["best_valid_rmse"])
        assert result["best_test_rmse"] is not None


class TestNativePacker:
    def test_native_matches_numpy(self, rng):
        import stargcn_tpu.graph.kernels as km

        if km.native_module() is None or not hasattr(
                km.native_module(), "pack_bits"):
            pytest.skip("native ext not built")
        for trial in range(12):
            E = rng.randint(1, 400)
            D, S_n = rng.randint(1, 40), rng.randint(1, 40)
            R = rng.randint(1, 6)
            dst = rng.randint(0, D, E).astype(np.int32)
            src = rng.randint(0, S_n, E).astype(np.int32)
            rat = rng.randint(0, R, E).astype(np.int32)
            mask = ((rng.uniform(size=E) > 0.3).astype(np.float32)
                    if trial % 2 else None)
            il = [0, 1024][trial % 2]
            a, d8a = bd.pack_bits(dst, src, rat, R, D, S_n, mask=mask,
                                  interleave=il)
            saved = km._native
            km._native = None
            try:
                b, d8b = bd.pack_bits(dst, src, rat, R, D, S_n,
                                      mask=mask, interleave=il)
            finally:
                km._native = saved
            assert d8a == d8b
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Tests for the device-side flat edge representation."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from stargcn_tpu.graph import BipartiteGraphData, CSRMat


def make_graph(rng, nu=12, ni=9, density=0.4):
    mat = sp.random(nu, ni, density=density, random_state=rng,
                    data_rvs=lambda n: rng.choice([1, 2, 3], n)).tocsr()
    mat.data = mat.data.astype(np.float32)
    csr = CSRMat.from_spy(mat, multi_link=np.array([1, 2, 3], np.float32))
    return csr, BipartiteGraphData.from_csr(csr, pad_multiple=32)


def test_from_csr_roundtrip(rng):
    csr, g = make_graph(rng)
    assert g.num_edges_padded % 32 == 0
    real = np.asarray(g.edge_pad_mask) > 0
    assert real.sum() == csr.nnz
    pairs = set(map(tuple, csr.node_pair_ids.T))
    got = set(zip(np.asarray(g.edge_user)[real].tolist(),
                  np.asarray(g.edge_item)[real].tolist()))
    assert got == pairs
    # rating level index decodes back to the value
    vals = csr.multi_link[np.asarray(g.edge_rating)[real]]
    want = {tuple(p): v for p, v in zip(csr.node_pair_ids.T, csr.values)}
    for u, i, v in zip(np.asarray(g.edge_user)[real],
                       np.asarray(g.edge_item)[real], vals):
        assert want[(u, i)] == v


def test_edge_mask_from_pairs(rng):
    csr, g = make_graph(rng)
    base = jnp.asarray(np.asarray(g.edge_pad_mask))
    # remove 3 existing edges + 1 non-edge + 1 invalid slot
    pairs = csr.node_pair_ids[:, :3]
    non_edge = None
    for u in range(csr.shape[0]):
        for i in range(csr.shape[1]):
            if csr.fetch_edges_by_id(np.array([[u], [i]]))[0] == 0:
                non_edge = (u, i)
                break
        if non_edge:
            break
    pu = jnp.asarray(np.array([*pairs[0], non_edge[0], 0], np.int32))
    pi = jnp.asarray(np.array([*pairs[1], non_edge[1], 0], np.int32))
    pv = jnp.asarray(np.array([1, 1, 1, 1, 0], np.float32))
    out = np.asarray(g.edge_mask_from_pairs(pu, pi, pv, base))
    assert (np.asarray(base) - out).sum() == 3  # only the 3 real edges drop
    # removed edges are zero
    eu = np.asarray(g.edge_user)
    ei = np.asarray(g.edge_item)
    for u, i in pairs.T:
        idx = np.nonzero((eu == u) & (ei == i)
                         & (np.asarray(g.edge_pad_mask) > 0))[0]
        assert out[idx] == 0.0

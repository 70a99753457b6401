"""Sampled-candidate ranking evaluation: HR@K / NDCG@K.

The reference constructs a ``NegEdgeGenerator`` inside its
``DataIterator`` (``mxgraph/iterators.py:208``) but never draws from
it — negative sampling is declared capability with no consumer.  This
module gives it one: the standard sampled-candidate ranking protocol
for recommenders (each held-out positive edge is ranked against
``num_negatives`` true non-edges drawn for the same user; hit-rate@K
and NDCG@K are averaged over positives).  Combined with the serving
artifact (``stargcn_tpu/serve.py``) this turns a trained STAR-GCN from
a rating regressor into an evaluable top-K recommender — a capability
the rating-RMSE-only reference experiment lacks.

TPU shape: scoring one evaluation batch is a single embedding gather
plus one batched inner product — ``U[u] (B, mid)`` against
``I[cand] (B, 1+N, mid)`` via einsum on the MXU, then an elementwise
rank reduction; all shapes are static (the final partial batch is
padded and masked), so the whole metric is one jitted function called
``ceil(P / B)`` times.

Protocol notes (pinned so the numbers are comparable run-to-run):

* negatives are drawn per-user uniformly over that user's non-edges in
  the evaluation graph, WITH replacement across the ``num_negatives``
  draws (the conventional protocol: candidate lists may contain
  duplicates, never true edges);
* the positive's rank counts strictly-greater negative scores only —
  ties resolve in the positive's favour (deterministic, and matches
  the common heap-based reference implementations);
* ``HR@K = mean(rank < K)``; ``NDCG@K = mean(1/log2(rank+2))`` over
  hits, 0 otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stargcn_tpu.data.iterators import NegEdgeGenerator


@functools.partial(jax.jit, static_argnums=(4,))
def _batch_ranks(U, I, uu, cand, k):
    """Rank of column 0 of ``cand`` among all candidates, per row.

    ``uu (B,)`` user row indices; ``cand (B, 1+N)`` item column indices
    with the positive in column 0.  Returns ``(hr, ndcg)`` per row.
    """
    u = U[uu]                      # (B, m)
    c = I[cand]                    # (B, 1+N, m)
    scores = jnp.einsum("bm,bnm->bn", u, c)
    rank = jnp.sum(scores[:, 1:] > scores[:, :1], axis=1)
    hit = rank < k
    ndcg = jnp.where(hit, 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0),
                     0.0)
    return hit.astype(jnp.float32), ndcg


def rank_eval(artifact, user_inds, item_inds, neg_gen: NegEdgeGenerator,
              *, num_negatives: int = 100, k: int = 10,
              batch_size: int = 4096, rng=None):
    """HR@K / NDCG@K of ``artifact`` over held-out positives.

    Parameters
    ----------
    artifact : ServingArtifact (or anything with ``user_feats`` /
        ``item_feats`` ndarrays) — the one-time-encoded scoring bundle.
    user_inds, item_inds : int arrays of equal length — held-out
        positive edges in ROW/COLUMN INDEX space (the space the
        artifact's feature tables are indexed by).
    neg_gen : NegEdgeGenerator over the evaluation graph — negatives
        are guaranteed non-edges of THAT graph, so pass the all-edges
        graph (``DataIterator.all_graph``) to exclude train leakage.
    num_negatives : candidates ranked against each positive.
    rng : np.random.RandomState for the negative draws (defaults to a
        fixed seed so repeated evaluations are comparable).

    Returns a dict: ``hr``, ``ndcg``, ``k``, ``num_negatives``,
    ``num_positives``.
    """
    rng = rng or np.random.RandomState(12345)
    uu = np.ascontiguousarray(np.asarray(user_inds, np.int64))
    ii = np.ascontiguousarray(np.asarray(item_inds, np.int64))
    assert uu.shape == ii.shape and uu.ndim == 1
    P = uu.size
    if P == 0:
        raise ValueError(
            "rank_eval got zero positives (empty eval segment, or "
            "max_positives filtered everything)")
    # (P, N) negatives: N independent per-user draws (with replacement
    # across draws, never an edge).  ``rng`` is passed through so the
    # draws do not depend on how far neg_gen's own generator has
    # advanced (e.g. a warm-up call before a timed one).
    neg = neg_gen.sample_cols_for_rows(
        np.repeat(uu, num_negatives), rng=rng).reshape(P, num_negatives)
    cand = np.concatenate([ii[:, None], neg], axis=1).astype(np.int32)

    U = jnp.asarray(np.asarray(artifact.user_feats, np.float32))
    I = jnp.asarray(np.asarray(artifact.item_feats, np.float32))
    hr_sum = 0.0
    ndcg_sum = 0.0
    B = int(batch_size)
    for s in range(0, P, B):
        bu = uu[s:s + B].astype(np.int32)
        bc = cand[s:s + B]
        valid = bu.size
        if valid < B:  # pad to the static batch shape, mask after
            bu = np.pad(bu, (0, B - valid))
            bc = np.pad(bc, ((0, B - valid), (0, 0)))
        hit, ndcg = _batch_ranks(U, I, jnp.asarray(bu), jnp.asarray(bc), k)
        hr_sum += float(jnp.sum(hit[:valid]))
        ndcg_sum += float(jnp.sum(ndcg[:valid]))
    return {"hr": hr_sum / P, "ndcg": ndcg_sum / P, "k": k,
            "num_negatives": num_negatives, "num_positives": P}


def rank_eval_from_iterator(artifact, data_iter, *, segment: str = "test",
                            num_negatives: int = 100, k: int = 10,
                            batch_size: int = 4096, rng=None,
                            max_positives: int | None = None):
    """Convenience wrapper: evaluate a segment of a ``DataIterator``.

    Builds the ``NegEdgeGenerator`` over the ALL-edges graph (so a
    sampled negative is never a train/valid/test edge) and converts the
    segment's global node-pair ids to index space.
    """
    if segment not in ("test", "valid"):
        raise ValueError(f"segment must be 'test' or 'valid', got "
                         f"{segment!r}")
    rng = rng or np.random.RandomState(12345)
    csr = data_iter.all_graph[data_iter.name_user, data_iter.name_item]
    pairs = (data_iter.test_node_pairs if segment == "test"
             else data_iter.valid_node_pairs)
    uu = np.asarray(csr.row_id_to_ind(pairs[0]), np.int64)
    ii = np.asarray(csr.col_id_to_ind(pairs[1]), np.int64)
    if max_positives is not None and uu.size > max_positives:
        sel = rng.choice(uu.size, max_positives, replace=False)
        uu, ii = uu[sel], ii[sel]
    gen = NegEdgeGenerator(rng, csr)
    out = rank_eval(artifact, uu, ii, gen, num_negatives=num_negatives,
                    k=k, batch_size=batch_size, rng=rng)
    out["segment"] = segment
    return out

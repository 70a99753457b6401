"""Serving: precomputed-embedding rating prediction + top-K recommendation.

The reference has no serving surface at all — inference is re-running the
full training-time forward per evaluation batch
(``/root/reference/experiments/STAR-GCN.py:465-498``).  For production
serving that is wasteful: the GCN encoder depends only on the graph and
the parameters, not on the query, so its output can be computed ONCE and
queries reduced to an inner product.

Key structural fact (``models/stargcn.py``): the rating head is

    rating(u, i) = <user_proj(enc_u), item_proj(enc_i)>  (last block)

with ``gen_ratings`` a parameter-free inner product
(``InnerProductLayer(mid_units=None)``, reference ``layers.py:210-222``
instantiated at ``STAR-GCN.py:261``).  So the pair

    U = user_proj(enc(user states))   (Nu, mid)
    I = item_proj(enc(item states))   (Ni, mid)

is a complete, self-contained scoring artifact: any rating is one dot
product, and recommendation for a user batch is one ``(B, mid) x
(mid, Ni)`` matmul — pure MXU work with zero gathers on the item side.

Pieces:

* :func:`export_serving` — run the trainer's eval-mode forward once
  (eval noise masking, the segment's graph variant — identical
  semantics to ``Trainer.predict``) and extract ``(U, I)``.
* :class:`ServingArtifact` — the deployable bundle: ``U``, ``I``, the
  rating denormalisation scalars, and the known rated edges in CSR form
  (for "exclude already-rated" recommendation).  ``save``/``load`` as a
  single ``.npz`` — no model code or graph needed at serving time.
* :class:`Predictor` — jitted, fixed-shape query paths:
  ``predict(user_ids, item_ids)`` and ``recommend(user_ids, k)``
  (full-catalog scoring + ``lax.top_k`` with rated-item exclusion
  applied ON DEVICE via a padded per-user rated list).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.float32(-3.4e38)


@dataclasses.dataclass
class ServingArtifact:
    """Deployable scoring bundle (see module docstring)."""

    user_feats: np.ndarray  # (Nu, mid) f32
    item_feats: np.ndarray  # (Ni, mid) f32
    rating_mean: float
    rating_std: float
    rating_min: float
    rating_max: float
    # Known (already-rated) edges, CSR over users: items rated by user u
    # are ``rated_items[rated_indptr[u]:rated_indptr[u+1]]``.
    rated_indptr: Optional[np.ndarray] = None
    rated_items: Optional[np.ndarray] = None

    @property
    def num_users(self) -> int:
        return self.user_feats.shape[0]

    @property
    def num_items(self) -> int:
        return self.item_feats.shape[0]

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            user_feats=self.user_feats, item_feats=self.item_feats,
            scalars=np.array([self.rating_mean, self.rating_std,
                              self.rating_min, self.rating_max],
                             np.float64),
            rated_indptr=(self.rated_indptr if self.rated_indptr is not None
                          else np.zeros(0, np.int64)),
            rated_items=(self.rated_items if self.rated_items is not None
                         else np.zeros(0, np.int32)))

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        z = np.load(path)
        mean, std, lo, hi = z["scalars"]
        indptr = z["rated_indptr"]
        items = z["rated_items"]
        has_rated = indptr.size > 0
        return cls(user_feats=z["user_feats"], item_feats=z["item_feats"],
                   rating_mean=float(mean), rating_std=float(std),
                   rating_min=float(lo), rating_max=float(hi),
                   rated_indptr=indptr if has_rated else None,
                   rated_items=items if has_rated else None)


def _pairs_to_csr(pairs: np.ndarray, num_users: int):
    """(2, E) user/item id pairs -> (indptr, sorted col ids) over users."""
    u = np.asarray(pairs[0], np.int64)
    i = np.asarray(pairs[1], np.int32)
    order = np.argsort(u, kind="stable")
    u, i = u[order], i[order]
    indptr = np.zeros(num_users + 1, np.int64)
    np.add.at(indptr, u + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, i


class Predictor:
    """Jitted fixed-shape query engine over a :class:`ServingArtifact`.

    Batches are padded to ``batch_size`` so one compiled program serves
    every request size (XLA static shapes).
    """

    def __init__(self, artifact: ServingArtifact, batch_size: int = 4096,
                 recommend_batch: int = 256):
        self.art = artifact
        self.batch_size = int(batch_size)
        self.recommend_batch = int(recommend_batch)
        self._U = jnp.asarray(artifact.user_feats)
        self._I = jnp.asarray(artifact.item_feats)
        self._predict_fn = None
        self._recommend_fns = {}

    # ------------------------------ predict ------------------------------

    def _build_predict(self):
        art = self.art

        def step(U, I, uu, ii):
            s = jnp.sum(jnp.take(U, uu, axis=0) * jnp.take(I, ii, axis=0),
                        axis=-1)
            return jnp.clip(s * art.rating_std + art.rating_mean,
                            art.rating_min, art.rating_max)

        return jax.jit(step)

    def predict(self, user_ids, item_ids) -> np.ndarray:
        """Denormalised, range-clipped ratings for arbitrary pairs.

        Matches ``Trainer.predict`` exactly on the same segment (the
        encoder ran once at export; scoring is the same inner product).
        """
        if self._predict_fn is None:
            self._predict_fn = self._build_predict()
        uu = np.asarray(user_ids, np.int32).ravel()
        ii = np.asarray(item_ids, np.int32).ravel()
        assert uu.shape == ii.shape
        n, B = uu.size, self.batch_size
        out = np.empty(n, np.float32)
        for s in range(0, n, B):
            e = min(s + B, n)
            pu = np.zeros(B, np.int32)
            pi = np.zeros(B, np.int32)
            pu[:e - s], pi[:e - s] = uu[s:e], ii[s:e]
            out[s:e] = np.asarray(
                self._predict_fn(self._U, self._I, pu, pi))[:e - s]
        return out

    # ----------------------------- recommend -----------------------------

    def _build_recommend(self, k: int, pad: int):
        art = self.art

        def step(U, I, uu, rated, rated_valid):
            scores = jnp.take(U, uu, axis=0) @ I.T  # (B, Ni) on the MXU
            if pad > 0:
                # Push already-rated items to -inf: one batched scatter
                # over the padded per-user rated lists.
                B = uu.shape[0]
                rows = jnp.broadcast_to(jnp.arange(B)[:, None], rated.shape)
                scores = scores.at[rows, rated].add(rated_valid * NEG_INF)
            vals, idx = jax.lax.top_k(scores, k)
            vals = jnp.clip(vals * art.rating_std + art.rating_mean,
                            art.rating_min, art.rating_max)
            return idx, vals

        return jax.jit(step)

    def recommend(self, user_ids, k: int = 10, exclude_rated: bool = True):
        """Top-``k`` items per user by predicted rating.

        Returns ``(item_ids, scores)`` of shape ``(len(user_ids), k)``.
        With ``exclude_rated`` (default), items the user already rated in
        the artifact's known graph are never recommended.
        """
        art = self.art
        uu = np.asarray(user_ids, np.int32).ravel()
        B = self.recommend_batch
        do_excl = (exclude_rated and art.rated_indptr is not None)
        # Pad width: longest rated list among queried users, rounded up
        # to limit recompilation across requests.
        pad = 0
        if do_excl:
            deg = (art.rated_indptr[uu + 1] - art.rated_indptr[uu])
            pad = int(-(-max(int(deg.max(initial=0)), 1) // 64) * 64)
        key = (k, pad)
        if key not in self._recommend_fns:
            self._recommend_fns[key] = self._build_recommend(k, pad)
        fn = self._recommend_fns[key]
        n = uu.size
        out_idx = np.empty((n, k), np.int32)
        out_val = np.empty((n, k), np.float32)
        for s in range(0, n, B):
            e = min(s + B, n)
            pu = np.zeros(B, np.int32)
            pu[:e - s] = uu[s:e]
            rated = np.zeros((B, max(pad, 1)), np.int32)
            valid = np.zeros((B, max(pad, 1)), np.float32)
            if do_excl:
                for r, u in enumerate(uu[s:e]):
                    lo, hi = art.rated_indptr[u], art.rated_indptr[u + 1]
                    d = int(hi - lo)
                    rated[r, :d] = art.rated_items[lo:hi]
                    valid[r, :d] = 1.0
            idx, vals = fn(self._U, self._I, pu, rated, valid)
            out_idx[s:e] = np.asarray(idx)[:e - s]
            out_val[s:e] = np.asarray(vals)[:e - s]
        return out_idx, out_val


def export_serving(trainer, segment: str = "test",
                   include_rated: bool = True) -> ServingArtifact:
    """Run the eval-mode encoder once and extract the scoring artifact.

    Semantics match ``Trainer.predict(segment=...)``: the segment's graph
    variant (its edge mask / static operands) and the evaluation noise
    masking (cold-start nodes -> zero embedding,
    ``iterators.py:228-236`` of the reference).
    """
    it = trainer.data_iter
    seg_key = "valid" if segment == "valid" else "test"
    noise_u = jnp.asarray(it.evaluate_embed_noise_dict["user"])
    noise_i = jnp.asarray(it.evaluate_embed_noise_dict["movie"])
    if trainer.shardings is not None:
        noise_u, noise_i = trainer.shardings.place_replicated(
            noise_u, noise_i)
    mask = trainer.edge_masks[seg_key]
    dense_adj = (trainer.dense_adj[seg_key]
                 if trainer.dense_adj is not None else None)
    variant_degrees = (trainer.variant_degrees[seg_key]
                       if trainer.variant_degrees is not None else None)

    @jax.jit
    def extract(params, g, mask, dense_adj, variant_degrees, ell_pack,
                noise_u, noise_i):
        fu, fi = trainer.features()
        dummy = jnp.zeros(1, jnp.int32)
        out = trainer.model.apply(
            {"params": params}, g, mask, noise_u, noise_i, dummy, dummy,
            user_features=fu, item_features=fi, dense_adj=dense_adj,
            variant_degrees=variant_degrees, ell_pack=ell_pack,
            train=False, return_rating_feats=True)
        return out["rating_feats"]

    feats = extract(trainer.params, trainer.graph_data, mask, dense_adj,
                    variant_degrees, trainer._ell_pack(seg_key),
                    noise_u, noise_i)
    U = np.asarray(feats["user"])[:trainer.model_cfg.num_users]
    I = np.asarray(feats["item"])[:trainer.model_cfg.num_items]

    rated_indptr = rated_items = None
    if include_rated:
        csr = it.all_graph[it.name_user, it.name_item]
        rated_indptr, rated_items = _pairs_to_csr(
            csr.node_pair_ids, trainer.model_cfg.num_users)

    return ServingArtifact(
        user_feats=U, item_feats=I,
        rating_mean=float(trainer.rating_mean),
        rating_std=float(trainer.rating_std),
        rating_min=float(trainer.rating_min),
        rating_max=float(trainer.rating_max),
        rated_indptr=rated_indptr, rated_items=rated_items)

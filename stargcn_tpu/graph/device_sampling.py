"""On-device sampled-plan construction — zero per-step host planning.

The host sampled mode (``graph/sampling.py`` + ``models/sampled.py``)
builds a ``StackedPlan`` on the CPU every iteration and ships ~15 MB of
packed plan arrays to the device; on a remote TPU runtime that transfer
(not the device compute) dominates the step wall.  This module moves the
ENTIRE planning phase inside the jitted training step: the graph lives
on the device once (CSR arrays per direction, ~160 MB at ML-10M), and
each step receives only the tiny batch feed (pair ids + noise + recon
ids, ~0.4 MB) plus an RNG key.  Frontier construction, fanout sampling,
deduplication, support weights, REMOVE_RATING exclusion and every
position map are computed as static-shape XLA ops:

* capped unique   = double-sort compaction (``_capped_unique``) — the
  device analogue of the host sampler's ``unique_inverse`` merge,
  padded to the frontier cap.  Scatter-free: XLA scatters measure
  pathologically slow on this TPU runtime, so dedup is sorts + flags
  only;
* fanout sampling = per-row ``uniform``-scaled index draw WITH
  replacement when ``deg > fanout`` (the host/native path uses Floyd
  sampling WITHOUT replacement — a lower-variance but sequential
  algorithm; with-replacement keeps the draw embarrassingly parallel on
  the VPU and is the standard GraphSAGE estimator).  When
  ``deg <= fanout`` both paths take every neighbor, so fanout >= max
  degree makes device and host plans produce EXACTLY the same
  neighborhoods (tests/test_device_sampling.py pins device-vs-host loss
  equality there);
* positions       = binary search into the sorted capped frontiers
  (``_positions``), log2(cap) gathers per query;
* dense-frontier fast path: when a cap clamps to the node count the
  frontier IS the whole node set, so dedup and position maps vanish —
  the ML-10M bench configuration runs entirely on this path.

The emitted pytree has the exact structure ``models.sampled
.sampled_forward`` consumes (``frontiers/blocks/pairs_pos/cross_gather/
recon_pos/recon_ids``), so the model code is shared verbatim with the
host-planned mode.

Frontier-cap overflow cannot raise inside jit; instead the builder
returns the per-type ``needed`` counts and an ``overflow`` flag.  The
trainer rejects the update for an overflowed step (parameters pass
through unchanged inside the same program), grows the caps, recompiles
once and retries the batch — the same crash-free recovery contract as
the host path's ``FrontierCapError`` (``train/sampled_loop.py``).

Reference context: this replaces the per-iteration host planning phase
of the reference two-phase mode (``mxgraph/layers/layers.py:260-385``
``gen_plan`` + ``summary_nodes``/CSR shipping) with a formulation where
the "plan" never exists on the host at all.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# REMOVE_RATING exclusion picks between three scatter-free
# formulations PER TYPE (see ``DevicePlanner.build``):
#
# * node-space one-hot (dense frontier, B * n_t within this budget):
#   the (batch, n_type) bf16 one-hot materialises once per step and
#   also yields the removal-adjusted degree counts as column sums.
#   2^29 elements = 1 GiB bf16; ML-10M (4096 x 69878 = 2.9e8) is
#   inside, 400k-user beyond-HBM is outside;
EXCLUDE_ONEHOT_MAX_ELEMS = 1 << 29
# * slot-space one-hot (any frontier, B * cap_t within this budget):
#   the hit test contracts over FRONTIER SLOTS via the chunked
#   ``onehot_segment_sum`` (the one-hot never materialises beyond one
#   chunk), so it scales with the frontier cap instead of the node
#   count — at the 400k x 50k beyond-HBM scale this replaced a
#   654 ms/step (cap, K, Ex) candidate compare with ~ms of MXU
#   streams.  EXACT (no exclude_cap / exclusion overflow);
EXCLUDE_SLOT_ONEHOT_MAX_ELEMS = 1 << 31
# * lex-sorted rank tables + bounded candidate compare: the
#   any-scale fallback beyond both budgets.


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceGraphTables:
    """Device-resident CSR tables for both bipartite directions.

    One instance per (graph, symm) pair; pass it as an ARGUMENT to the
    jitted step (not a closure) so the arrays live in HBM as buffers
    instead of being folded into the executable as literals.
    """

    # per direction t in ("user", "item"): rows are type t
    ind_ptr: Dict[str, jnp.ndarray]      # (n_t + 1,) int32
    end_points: Dict[str, jnp.ndarray]   # (E,) int32 col indices
    rating_idx: Dict[str, jnp.ndarray]   # (E,) int32 rating level
    row_deg: Dict[str, jnp.ndarray]      # (n_t,) int32
    col_deg: Dict[str, jnp.ndarray]      # (n_other,) int32 (cols of t)
    row_ids: Dict[str, jnp.ndarray]      # (n_t,) int32 index -> global id
    id2ind: Dict[str, jnp.ndarray]       # (max_id + 1,) int32 id -> index

    # static per-type flag: row ids ARE 0..n-1 (true for every graph
    # whose node ids were never remapped) — enables the identity-
    # frontier shortcuts in the sampled forward
    ids_iota: tuple = (False, False)

    def tree_flatten(self):
        keys = ("ind_ptr", "end_points", "rating_idx", "row_deg",
                "col_deg", "row_ids", "id2ind")
        leaves = [getattr(self, k)[t] for k in keys
                  for t in ("user", "item")]
        return leaves, (keys, self.ids_iota)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        keys, ids_iota = aux
        it = iter(leaves)
        return cls(**{k: {"user": next(it), "item": next(it)}
                      for k in keys}, ids_iota=ids_iota)

    @property
    def n(self):
        return {t: self.row_ids[t].shape[0] for t in ("user", "item")}

    @staticmethod
    def build(graph, name_user="user", name_item="movie"):
        """Extract both directions from a ``HeterGraph`` (host numpy; the
        arrays transfer on first use and stay resident)."""
        csr = {"user": graph[name_user, name_item],
               "item": graph[name_item, name_user]}
        out = dict(ind_ptr={}, end_points={}, rating_idx={}, row_deg={},
                   col_deg={}, row_ids={}, id2ind={})
        for t in ("user", "item"):
            c = csr[t]
            out["ind_ptr"][t] = jnp.asarray(c.ind_ptr, jnp.int32)
            out["end_points"][t] = jnp.asarray(c.end_points, jnp.int32)
            out["rating_idx"][t] = jnp.asarray(
                np.searchsorted(c.multi_link, c.values), jnp.int32)
            out["row_deg"][t] = jnp.asarray(c.row_degrees, jnp.int32)
            out["col_deg"][t] = jnp.asarray(c.col_degrees, jnp.int32)
            ids = np.asarray(c.row_ids, np.int64)
            out["row_ids"][t] = jnp.asarray(ids, jnp.int32)
            inv = np.zeros(int(ids.max(initial=0)) + 1, np.int32)
            inv[ids] = np.arange(ids.size, dtype=np.int32)
            out["id2ind"][t] = jnp.asarray(inv)
        iota = tuple(
            bool((np.asarray(csr[t].row_ids)
                  == np.arange(csr[t].shape[0])).all())
            for t in ("user", "item"))
        return DeviceGraphTables(**out, ids_iota=iota)


def _capped_unique(x, cap, n):
    """Sorted unique of ``x`` (values in ``[0, n]``; ``n`` itself is the
    invalid sentinel), padded with ``n`` to exactly ``cap`` slots.
    Returns ``(uniq, needed)`` where ``needed`` counts the REAL distinct
    values — ``needed > cap`` means the tail was truncated (the caller
    must treat the plan as invalid and grow its caps).

    SCATTER-FREE by design: sort, flag first occurrences, then a second
    sort compacts the flagged values to the front (everything else maps
    to the sentinel, which sorts last).  XLA scatters measure
    pathologically slow on this TPU runtime (a 783k-element scatter-set
    into a 70k map takes SECONDS where these sorts take a fraction of a
    millisecond), so the planner avoids the scatter/segment op class
    entirely."""
    s = jnp.sort(x)
    keep = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]) & (s < n)
    needed = keep.sum().astype(jnp.int32)
    uniq = jnp.sort(jnp.where(keep, s, n))[:cap]
    return uniq.astype(jnp.int32), needed


def _positions(frontier, n, query, query_valid=None):
    """(pos, ok) of ``query`` in a SORTED capped frontier array over
    index space ``[0, n)`` — the device twin of the host planners\'
    intern maps, as a binary search (log2(cap) gathers per query; no
    scatter-built inverse map — see ``_capped_unique`` on why).
    Missing / invalid queries give ``pos=0, ok=0`` (the convention
    every consumer masks by)."""
    cap = frontier.shape[0]
    ss = jnp.minimum(
        jnp.searchsorted(frontier, query).astype(jnp.int32), cap - 1)
    ok = (jnp.take(frontier, ss) == query) & (query < n)
    if query_valid is not None:
        ok = ok & query_valid
    return jnp.where(ok, ss, 0), ok.astype(jnp.float32)


class DevicePlanner:
    """Builds the sampled-plan pytree inside jit.

    ``caps`` = ``{"user": int, "item": int}`` frontier caps (every level
    pads to them, like ``BlockSampler`` with ``frontier_caps``).
    ``symm`` selects 1/sqrt(d_r*d_c) vs 1/d_r supports — the same
    normalisation arithmetic as ``BlockSampler._inv_factors``.
    """

    def __init__(self, model_cfg, caps, fanout, *, symm=True,
                 exclude_cap: int = 16):
        self.nblocks = int(model_cfg.nblocks)
        self.num_layers = len(model_cfg.agg_units)
        self.caps = {t: int(caps[t]) for t in ("user", "item")}
        self.fanout = int(fanout)
        self.symm = bool(symm)
        # max batch edges per node the REMOVE_RATING mask can represent
        # (exact: aux reports the true per-node maximum, and an overflow
        # rejects the step so the trainer can grow this and retry)
        self.exclude_cap = int(exclude_cap)
        assert self.fanout > 0

    # ------------------------------------------------------------------

    def _sample_level(self, tab, t, other, frontier_t, key, rem,
                      ident: bool = False):
        """Fanout-sample neighbors of type-``other`` for every valid row
        of ``frontier_t``; returns (nbr index array (cap,K), rating
        (cap,K), weight (cap,K), row validity).

        ``ident`` (STATIC) asserts ``frontier_t == arange(n_t)`` — the
        dense path, where cap clamps to the node count — so every
        per-row gather (ind_ptr, degree, removal count) is an identity
        and reads its table directly instead of paying an n-row gather
        (measured: these identity gathers were a visible slice of the
        ML-10M devplan step)."""
        K = self.fanout
        n_t = tab.n[t]
        j = jnp.arange(K, dtype=jnp.int32)[None, :]
        u = jax.random.uniform(key, (frontier_t.shape[0], K))
        # Only the start/deg/row-validity SOURCES differ between the
        # identity (dense) and gathered paths; the r/slot_ok/e draw
        # arithmetic is shared so the two can never drift.
        if ident:
            assert frontier_t.shape[0] == n_t
            safe = frontier_t
            start = tab.ind_ptr[t][:-1]
            deg = tab.row_deg[t]
            ok_row = None
        else:
            ok_row = frontier_t < n_t
            safe = jnp.where(ok_row, frontier_t, 0)
            start = jnp.take(tab.ind_ptr[t], safe)
            deg = jnp.take(tab.ind_ptr[t], safe + 1) - start
        r = jnp.minimum((u * deg[:, None]).astype(jnp.int32),
                        jnp.maximum(deg[:, None] - 1, 0))
        r = jnp.where(deg[:, None] <= K, j, r)
        slot_ok = (deg[:, None] > K) | (j < deg[:, None])
        e = start[:, None] + jnp.minimum(
            r, jnp.maximum(deg[:, None] - 1, 0))
        if ok_row is not None:
            slot_ok = ok_row[:, None] & slot_ok
            e = jnp.where(ok_row[:, None], e, 0)
        nbr = jnp.take(tab.end_points[t], e)
        rating = jnp.take(tab.rating_idx[t], e)
        # support from (removal-adjusted) degrees — BlockSampler
        # ``_inv_factors`` arithmetic.  ``rem`` holds dense per-node
        # batch-edge counts (built once per step, scatter-free), so the
        # adjustment is one gather per slot.
        dr = deg[:, None].astype(jnp.float32)
        dc = jnp.take(tab.col_deg[t], nbr).astype(jnp.float32)
        if rem is not None:
            rem_rows = rem[t] if ident else jnp.take(rem[t], safe)
            dr = dr - rem_rows[:, None]
            dc = dc - jnp.take(rem[other], nbr)
        if self.symm:
            denom = dr * dc
            sup = jnp.where(denom > 0,
                            jax.lax.rsqrt(jnp.maximum(denom, 1.0)), 0.0)
        else:
            sup = jnp.where(dr > 0, 1.0 / jnp.maximum(dr, 1.0), 0.0)
        weight = sup * slot_ok.astype(jnp.float32)
        return nbr, rating, weight, slot_ok, safe

    def build(self, tab: DeviceGraphTables, key, bu_ind, bi_ind,
              pairs_valid, recon_u_ids, recon_i_ids, *,
              exclude: bool = False):
        """The full stacked plan as a jit-internal pytree.

        ``bu_ind``/``bi_ind`` are padded batch pair INDICES (row spaces
        of the two directions); ``recon_*_ids`` are the -1-padded global
        id arrays (they pass through to the tree's ``recon_ids``).
        Returns ``(plan, pairs_pos, aux)`` with ``aux`` carrying the
        exact per-type frontier sizes the plan needed plus the
        ``overflow`` flag.
        """
        big = {t: tab.n[t] for t in ("user", "item")}
        # a frontier can never exceed the node count, so caps clamp to
        # it — which also makes overflow impossible at cap == n
        cap = {t: min(self.caps[t], tab.n[t]) for t in ("user", "item")}
        K = self.fanout

        # Dense-frontier fast path flags (used below AND by the
        # exclusion regime choice): a clamped cap == n means the padded
        # frontier IS the full node set, so interning is the identity —
        # no dedup, no position maps, and overflow is impossible.  (At
        # ML-10M / batch 4096 / fanout 8 the probed caps exceed both
        # node counts, so the production sampled bench runs entirely on
        # this path; the dedup path serves the true beyond-HBM regime
        # where cap < n.)  Identity levels are stored as None.
        dense = {t: cap[t] >= tab.n[t] for t in ("user", "item")}

        # REMOVE_RATING batch-edge exclusion + removal-adjusted degrees
        # (BlockSampler.removal_args semantics), scatter-free, in one of
        # two formulations chosen STATICALLY per step:
        #
        # * one-hot-MXU (dense frontiers, B * n_t within
        #   EXCLUDE_ONEHOT_MAX_ELEMS — the ML-10M production regime):
        #   materialise a (B, n_t) bf16 batch-row one-hot per direction
        #   once; per-node counts are its column sums and the per-slot
        #   hit test becomes one (n_t, B) x (B, K) dot-general — the
        #   (n, K, Ex) candidate gather/compare (measured ~30 ms/step at
        #   ML-10M) and the per-direction iota-searchsorted rank tables
        #   (~12 ms) both disappear into MXU/VPU streams.  EXACT: no
        #   exclude_cap, no possible exclusion overflow.
        #
        # * lex-sorted rank tables (any scale — this is the beyond-HBM
        #   path): sort batch pairs row-major with a TWO-KEY
        #   ``lax.sort`` (no row*n+col composite key, so arbitrary
        #   n_user*n_item id products work — the round-4 int32 edge-key
        #   limit is gone), per-node start-rank/count via an arange
        #   searchsorted, then per sampled slot one bounded
        #   candidate-list comparison against the row's <= exclude_cap
        #   batch partners.  (A per-slot binary search over the batch
        #   keys measured ~400 ms/step — 20M pointer-chasing gathers —
        #   and a within-row binary-search variant measured 176-193 ms
        #   vs 128-133 for this compare; both rejected.)
        rem = exdat = None
        needed_ex = jnp.int32(0)
        if exclude:
            B = bu_ind.shape[0]
            exdat = {}
            rem = {}
            ok_b = pairs_valid > 0
            for t, rows_b, cols_b in (("user", bu_ind, bi_ind),
                                      ("item", bi_ind, bu_ind)):
                n_t = tab.n[t]
                # invalid batch slots -> row n_t (all-zero one-hot row
                # / sorts-last sentinel) and partner -1 (matches no
                # neighbor)
                rows_m = jnp.where(ok_b, rows_b, n_t)
                cols_m = jnp.where(ok_b, cols_b, -1)
                if dense[t] and B * n_t <= EXCLUDE_ONEHOT_MAX_ELEMS:
                    oh = (rows_m[:, None]
                          == jnp.arange(n_t, dtype=jnp.int32)[None, :]
                          ).astype(jnp.bfloat16)          # (B, n_t)
                    exdat[t] = ("onehot", oh, rows_m, cols_m)
                    # exact f32 accumulation: 0/1 products, count <= B
                    rem[t] = jnp.sum(oh, axis=0, dtype=jnp.float32)
                    continue
                rows_sorted, partner = jax.lax.sort(
                    (rows_m.astype(jnp.int32),
                     cols_m.astype(jnp.int32)), num_keys=2)
                iota_n = jnp.arange(n_t + 1, dtype=jnp.int32)
                # ranks of row boundaries in the sorted row space
                bounds = jnp.searchsorted(rows_sorted, iota_n)
                start, cnt = bounds[:-1], jnp.diff(bounds)
                rem[t] = cnt.astype(jnp.float32)
                if B * cap[t] <= EXCLUDE_SLOT_ONEHOT_MAX_ELEMS:
                    exdat[t] = ("slot", rows_m, cols_m)
                else:
                    exdat[t] = ("ranktab", start.astype(jnp.int32),
                                cnt.astype(jnp.int32), partner, B)
                    needed_ex = jnp.maximum(needed_ex, cnt.max())

        def excl_mask(t, frontier_t, nbr, ident=False):
            """keep-mask over the sampled slots of type ``t``'s CURRENT
            level (``frontier_t`` = the sorted level array the sampling
            ran over; ``arange(n)`` on the dense/identity path)."""
            if exdat is None or t not in exdat:
                return None
            mode = exdat[t][0]
            if mode == "onehot":
                _, oh, rows_m, cols_m = exdat[t]
                # hit[v, k] = #batch edges (v, nbr[v, k]): gather the
                # batch rows' sampled neighbors (B, K), compare against
                # each edge's partner, contract back over the batch on
                # the MXU.  Dense path: nbr rows ARE node rows.
                nbr_b = jnp.take(nbr, jnp.minimum(rows_m, nbr.shape[0] - 1),
                                 axis=0)                    # (B, K)
                h = (nbr_b == cols_m[:, None]).astype(jnp.bfloat16)
                hits = jax.lax.dot_general(
                    oh, h, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (n_t, K)
                return hits < 0.5
            if mode == "slot":
                from stargcn_tpu.ops.gather import onehot_segment_sum
                _, rows_m, cols_m = exdat[t]
                cap_t = frontier_t.shape[0]
                # slot of each batch row in THIS level's sorted
                # frontier (levels grow monotonically, so every valid
                # batch row is present; missing/invalid -> seg cap_t,
                # which onehot_segment_sum drops)
                pos, okq = _positions(frontier_t, tab.n[t], rows_m,
                                      query_valid=(rows_m < tab.n[t]))
                seg = jnp.where(okq > 0, pos, cap_t)
                nbr_b = jnp.take(nbr, jnp.minimum(seg, cap_t - 1),
                                 axis=0)                    # (B, K)
                h = ((nbr_b == cols_m[:, None])
                     & (okq > 0)[:, None]).astype(jnp.bfloat16)
                hits = onehot_segment_sum(h, seg, cap_t)    # (cap, K)
                return hits < 0.5
            _, start, cnt, partner, B = exdat[t]
            j = jnp.arange(self.exclude_cap, dtype=jnp.int32)
            rows_safe = jnp.where(frontier_t < tab.n[t], frontier_t, 0)
            # ident (dense path): rows == arange(n_t), so the per-row
            # start/count gathers are identities
            st_rows = start if ident else jnp.take(start, rows_safe)
            cn_rows = cnt if ident else jnp.take(cnt, rows_safe)
            idx = jnp.minimum(st_rows[:, None] + j, B - 1)
            cand = jnp.take(partner, idx)                  # (cap, Ex)
            ok_c = j[None, :] < cn_rows[:, None]
            cand = jnp.where(ok_c, cand, -1)
            hit = (nbr[:, :, None] == cand[:, None, :]).any(-1)
            return jnp.logical_not(hit)

        # recon indices (id -> index; -1 stays invalid)
        rec_ind = {}
        for t, ids in (("user", recon_u_ids), ("item", recon_i_ids)):
            okq = ids >= 0
            ii = jnp.take(tab.id2ind[t], jnp.maximum(ids, 0))
            rec_ind[t] = jnp.where(okq, ii, big[t])

        base = {
            "user": jnp.concatenate(
                [jnp.where(pairs_valid > 0, bu_ind, big["user"]),
                 rec_ind["user"]]),
            "item": jnp.concatenate(
                [jnp.where(pairs_valid > 0, bi_ind, big["item"]),
                 rec_ind["item"]]),
        }

        needed = {"user": jnp.int32(0), "item": jnp.int32(0)}

        def uniq(t, arr):
            if dense[t]:
                return None  # identity frontier
            u, n = _capped_unique(arr, cap[t], big[t])
            needed[t] = jnp.maximum(needed[t], n)
            return u

        def lvl_arr(t, lvl):
            """Materialise a level for use as a query array."""
            if lvl is None:
                return jnp.arange(cap[t], dtype=jnp.int32)
            return lvl

        def pos_of(t, frontier_t, query, query_valid=None):
            """(pos, ok) of index-space queries in a level of type t."""
            if dense[t]:
                ok = (query >= 0) & (query < big[t])
                if query_valid is not None:
                    ok = ok & query_valid
                return jnp.where(ok, query, 0), ok.astype(jnp.float32)
            return _positions(frontier_t, big[t], query, query_valid)

        chains = []       # per chain: (levels, blocks_bottom_up)
        tgt = dict(base)
        for _ in range(self.nblocks):
            fr = {t: uniq(t, tgt[t]) for t in ("user", "item")}
            levels = [fr]
            blocks_td = []
            for _ in range(self.num_layers):
                cur = levels[-1]
                key, ku, ki = jax.random.split(key, 3)
                samp = {}
                for t, other, k in (("user", "item", ku),
                                    ("item", "user", ki)):
                    fr_t = lvl_arr(t, cur[t])
                    nbr, rating, weight, slot_ok, rows_safe = \
                        self._sample_level(tab, t, other, fr_t, k, rem,
                                           ident=dense[t])
                    keep = excl_mask(t, fr_t, nbr, ident=dense[t])
                    if keep is not None:
                        weight = weight * keep
                    samp[t] = (nbr, rating, weight, slot_ok)
                nxt = {}
                for t, other in (("user", "item"), ("item", "user")):
                    if dense[t]:
                        nxt[t] = None
                        continue
                    nbr, _, _, slot_ok = samp[other]
                    nxt[t] = uniq(t, jnp.concatenate(
                        [lvl_arr(t, cur[t]),
                         jnp.where(slot_ok, nbr, big[t]).reshape(-1)]))
                lvl_blocks = {}
                for t, other in (("user", "item"), ("item", "user")):
                    nbr, rating, weight, slot_ok = samp[t]
                    npos, nok = pos_of(other, nxt[other], nbr,
                                       query_valid=slot_ok)
                    # combined idx = rating * n_src + pos
                    # (models/sampled.py _blk_host contract)
                    idx = (jnp.where(slot_ok, rating, 0)
                           * jnp.int32(cap[other]) + npos)
                    lvl_blocks[t] = {"idx": idx.astype(jnp.int32),
                                     "weight": weight * nok}
                blocks_td.append(lvl_blocks)
                levels.append(nxt)
            chains.append((levels, blocks_td[::-1]))
            f0 = levels[-1]
            tgt = {t: (base[t] if dense[t] else jnp.concatenate(
                [base[t], f0[t]])) for t in ("user", "item")}
        chains = chains[::-1]  # block 0 = deepest chain

        def to_ids(t, lvl):
            if lvl is None:
                return tab.row_ids[t]
            ok = lvl < big[t]
            return jnp.where(
                ok, jnp.take(tab.row_ids[t], jnp.where(ok, lvl, 0)), -1)

        plan = {
            "frontiers": [
                {t: to_ids(t, levels[-1][t]) for t in ("user", "item")}
                for levels, _ in chains],
            "blocks": [blocks for _, blocks in chains],
            "pairs_pos": None,  # filled below (trainer contract)
            "cross_gather": [None] + [
                {t: pos_of(t, chains[b - 1][0][0][t],
                           lvl_arr(t, chains[b][0][-1][t]))
                 for t in ("user", "item")}
                for b in range(1, self.nblocks)],
            "recon_pos": [
                {t: pos_of(t, levels[0][t], rec_ind[t])
                 for t in ("user", "item")}
                for levels, _ in chains],
            "recon_ids": {"user": recon_u_ids, "item": recon_i_ids},
        }
        pairs_pos = [
            {"user": pos_of("user", levels[0]["user"], bu_ind)[0],
             "item": pos_of("item", levels[0]["item"], bi_ind)[0]}
            for levels, _ in chains]
        overflow = ((needed["user"] > cap["user"])
                    | (needed["item"] > cap["item"])
                    | (needed_ex > self.exclude_cap))
        aux = {"needed_user": needed["user"],
               "needed_item": needed["item"],
               "needed_exclude": needed_ex,
               "overflow": overflow,
               # STATIC (python bools): every frontier of this type is
               # the full node set in natural order AND node ids are
               # 0..n-1 — the sampled forward can then read embedding
               # tables with an elementwise row mask (the full-graph
               # module's formulation) instead of a gather whose
               # backward is a serialized n-row scatter, and pass
               # cross-block features through without a gather.
               "identity": {t: bool(dense[t]) and bool(
                   tab.ids_iota[0 if t == "user" else 1])
                   for t in ("user", "item")}}
        return plan, pairs_pos, aux

"""Mini-batch training engine for the sampled two-phase mode.

The beyond-HBM counterpart of ``Trainer`` with FULL schedule parity with
the reference ``train()`` (``experiments/STAR-GCN.py:507-713``): rating +
reconstruction batches from the same ``DataIterator`` samplers,
REMOVE_RATING batch-edge exclusion, interleaved valid/test evaluation,
patience-driven LR decay with early stopping, best/last checkpoints, and
``MetricLogger`` CSVs.  Reached from the CLI when
``GRAPH_SAMPLER.NUM_NEIGHBORS > 0`` (reference ``STAR-GCN.py:57``).

Host plan building (``StackedPlan.build``) runs in an optional one-ahead
prefetch thread; the device step is one jitted program for every batch
(fixed frontier caps), like the full-graph trainer.  Evaluation samples
neighborhoods with the SAME fanout as training, on the eval graph, with
the cold-start eval noise — reference ``evaluate()`` semantics
(``STAR-GCN.py:465-498``).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stargcn_tpu.graph.device import BipartiteGraphData
from stargcn_tpu.graph.sampling import BlockSampler
from stargcn_tpu.models.sampled import (StackedPlan, pack_tree,
                                        sampled_forward, unpack_tree)
from stargcn_tpu.models.stargcn import STARGCN
from stargcn_tpu.train.loop import make_metric_loggers, make_optimizer


def _round_up(n, m):
    return max(m, -(-n // m) * m)


def resolve_sampled_backend(backend: str, caps: dict, fanout: int, *,
                            for_training: bool = True) -> str:
    """'auto' -> the measured winner for the plan shapes AND step kind.

    The gate keys on the column that matters for the caller.  From the
    round-4 crossover sweep (scripts/sweep_pallas_crossover.py,
    BASELINE.md "Pallas ELL crossover"):

    * fwd+bwd — what a TRAINING step runs — the Pallas fixed-fanout ELL
      kernels never beat the XLA gather formulation anywhere on the
      grid (best 0.98x at D=8192/K=32/F=256, worst 0.44x at
      D=32768/K=32): training 'auto' resolves to XLA at EVERY shape.
      (Round 4 gated on the forward column here and auto-picked a
      measured 2.3x fwd+bwd loss at the upper edge of its own window —
      VERDICT r4 weak #1.)
    * forward only — inference / serving over sampled frontiers — the
      kernels win at moderate frontier sizes with wide fanout (2.08x at
      D=8192/K=32/F=256, 1.2-1.6x across D<=32k at K=32) and lose hard
      at D~87k/K=8 (XLA 7.5x): forward 'auto' picks Pallas only inside
      that measured win region.
    """
    if backend != "auto":
        return backend
    if for_training or jax.default_backend() != "tpu":
        return "xla"
    d_max = max(caps.values()) if caps else 1 << 30
    return "pallas" if (d_max <= 32768 and 16 <= fanout <= 32) else "xla"


class SampledTrainer:
    """Sampled-mode training driver with the ``Trainer`` schedule.

    Shares the full-graph model's parameter pytree (checkpoints
    interchange with ``Trainer``; ``models/sampled.py`` executes the
    same math over sampled frontiers).
    """

    def __init__(self, model_cfg, data_iter, settings, *, fanout,
                 save_dir: Optional[str] = None, save_id: int = 0,
                 frontier_caps=None, name_user="user", name_item="movie",
                 backend: str = "xla", cap_slack: float = 1.6,
                 mesh=None, plan_device: bool = False,
                 remat: bool = False, plan_split: bool = False):
        assert fanout > 0, "SampledTrainer needs a positive fanout"
        if model_cfg.use_fea_proj and model_cfg.use_dae \
                and not model_cfg.use_embed:
            raise NotImplementedError(
                "sampled DAE reconstruction needs embedding targets "
                "(USE_EMBED); feature-only reconstruction is not wired")
        self.model_cfg = model_cfg
        self.data_iter = data_iter
        self.s = settings
        self.fanout = fanout
        self.save_dir = save_dir
        self.save_id = save_id
        self.backend = backend
        # per-level jax.checkpoint in the sampled forward: trades
        # recompute FLOPs for the (N, K, E)/(N, R, E) level residuals —
        # required at beyond-HBM frontier sizes (a 262k-row frontier's
        # saved residuals OOM 16 GB HBM), off for speed at bench scales
        self.remat = bool(remat)
        self.names = (name_user, name_item)
        self._fea = None
        if model_cfg.use_fea_proj:
            # Raw feature matrices for the shared projection MLP
            # (reference STAR-GCN.py:182-191); rows are gathered per
            # frontier inside the step.
            g = data_iter.all_graph
            self._fea = (np.asarray(g.features[name_user], np.float32),
                         np.asarray(g.features[name_item], np.float32))

        # ---- mesh mode: DP over frontier/batch rows ('data' axis) +
        # row-sharded embedding tables ('model' axis).  The packed feed
        # buffers shard over 'data' (splits the host->device transfer);
        # with_sharding_constraint inside sampled_forward row-shards the
        # per-node compute; GSPMD inserts the collective pulls from the
        # sharded tables — the multi-chip answer to the reference's
        # host-side plan shipping (mxgraph/layers/layers.py:260-385).
        self.mesh = mesh
        self.shardings = None
        self._row_shard = None
        self._feed_shard = None
        self._chunk_feed_shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from stargcn_tpu.parallel.shardings import GraphShardings
            self.shardings = GraphShardings(mesh)
            self._row_shard = NamedSharding(mesh, P("data", None))
            self._feed_shard = NamedSharding(mesh, P("data"))
            self._chunk_feed_shard = NamedSharding(mesh, P(None, "data"))

        it = data_iter
        train_ratings = it.train_ratings
        self.rating_mean = float(train_ratings.mean())
        self.rating_std = float(train_ratings.std())
        vals = it.possible_rating_values
        self.rating_min = float(vals.min())
        self.rating_max = float(vals.max())

        n_train = it.train_node_pairs.shape[1]
        self.train_batch = min(self.s.rating_batch_size, n_train)
        # Reference removes batch edges only when the batch is a strict
        # subset of the training edges (STAR-GCN.py:594).
        self.do_remove = self.s.remove_rating and self.train_batch < n_train
        # Array sizes round up to a multiple of 16 (padded slots carry
        # valid=0 / id=-1 and are masked everywhere).  Regular row
        # counts tile cleanly on the MXU AND divide evenly on mesh
        # axes — uneven GSPMD partitions of grad-carrying row dims
        # produced NaN backward padding artifacts on the CPU partitioner
        # (observed at recon rows 95/169 on a 2x2 mesh).
        self.train_batch_pad = _round_up(self.train_batch, 16)

        # Fixed-size recon batches (pad with -1): the reference passes
        # the recon sampler's batch ids into the plan (STAR-GCN.py:602).
        self.recon_cap = {}
        if self.s.use_dae:
            for t, key in (("user", name_user), ("item", name_item)):
                n_recon = int(np.ceil(
                    it.embed_P_mask[key]
                    * it.recon_train_candidates[key].size))
                self.recon_cap[t] = _round_up(
                    min(self.s.recon_batch_size, n_recon), 16)
        else:
            self.recon_cap = {"user": 0, "item": 0}

        L = len(model_cfg.agg_units)
        self.samplers = {
            seg: BlockSampler(g, num_layers=L, fanout=fanout,
                              symm=model_cfg.agg_norm_symm,
                              name_user=name_user, name_item=name_item)
            for seg, g in (("train", it.train_graph),
                           ("valid", it.val_graph),
                           ("test", it.test_graph))}
        self.caps = (dict(frontier_caps) if frontier_caps is not None
                     else self._probe_caps(cap_slack))
        for s in self.samplers.values():
            s.frontier_caps = self.caps
        logging.info("sampled frontier caps: %s", self.caps)
        if self.backend == "auto":
            # evaluation is forward-only, so it resolves on the
            # crossover's forward column (the Pallas tier's measured
            # win region); training resolves on fwd+bwd (XLA at every
            # measured shape) — resolve BOTH before the training
            # default overwrites self.backend.
            self.eval_backend = resolve_sampled_backend(
                "auto", self.caps, fanout, for_training=False)
            self.backend = resolve_sampled_backend("auto", self.caps,
                                                   fanout)
            logging.info("sampled backend resolved to %r (train) / %r "
                         "(eval) (caps %s, fanout %d)", self.backend,
                         self.eval_backend, self.caps, fanout)
        else:
            self.eval_backend = self.backend

        self.params = self._init_params()
        if self.shardings is not None:
            self.params = self.shardings.place_params(self.params)
        self.opt = make_optimizer(settings)
        self.opt_state = self.opt.init(self.params)
        self.lr = self.s.lr
        self._rng_key = jax.random.PRNGKey(self.s.seed)

        # The packed feed: every per-batch array (plan + positions +
        # noise + targets) ships as ONE int32 + ONE float32 buffer,
        # unpacked inside the trace (models/sampled.py pack_tree) — a
        # per-array feed costs a full dispatch round-trip per array on
        # a remote runtime, which dominated the sampled step wall.
        self._train_step = jax.jit(partial(_sampled_train_step, self),
                                   static_argnums=(4,),
                                   donate_argnums=(0, 1))
        self._eval_step = jax.jit(partial(_sampled_eval_step, self),
                                  static_argnums=(3,))
        self._chunk_step = None  # per-k jit cache (train_chunk)
        self._chunk_k = 0

        # ---- device-planned mode: the whole planning phase moves
        # inside the jitted step (graph/device_sampling.py); the feed
        # shrinks from ~15 MB of plan arrays to the batch ids + noise.
        # Training only — evaluation keeps the host-planned path (it
        # runs on the eval graphs at eval cadence).
        self.plan_device = bool(plan_device)
        self._dev_tables = None
        if self.plan_device:
            from stargcn_tpu.graph.device_sampling import DeviceGraphTables
            if self.backend == "pallas":
                raise NotImplementedError(
                    "plan_device pairs with the XLA sampled backend")
            self._dev_tables = DeviceGraphTables.build(
                data_iter.train_graph, name_user, name_item)
            # REMOVE_RATING per-node batch-edge bound (device planner;
            # grows on overflow like the frontier caps).  Probed from a
            # few real batches: a POPULAR node's multiplicity in a
            # uniform edge batch scales with its degree share (an item
            # with 0.5% of ML-10M's edges appears ~20x in a 4096
            # batch), so a fixed small bound would reject every step.
            mult = 4
            rs_probe = data_iter.rating_sampler(
                batch_size=self.train_batch, segment="train")
            for _ in range(3):
                pairs, _ = next(rs_probe)
                for arr in pairs:
                    mult = max(mult, int(np.bincount(
                        np.asarray(arr, np.int64)).max()))
            self.exclude_cap = _round_up(2 * mult, 16)
            # (caps, spec) are static; tables/feed are device buffers
            self._train_step_dev = jax.jit(
                partial(_sampled_train_step_dev, self),
                static_argnums=(0, 6), donate_argnums=(1, 2))
            self._chunk_step_dev = None
            self._chunk_k_dev = 0
            # plan_split: the planning phase and the model update run
            # as TWO jitted programs instead of one fused step.  The
            # axon TPU relay fails to load/execute single programs past
            # a composite size/argument threshold at beyond-HBM node
            # counts (measured: the fused step loads at <= 400k users +
            # small tables and RESOURCE_EXHAUSTEDs beyond, while the
            # same computation as two programs runs — the plan program
            # carries the big graph-table arguments, the update program
            # carries the parameters, and neither crosses the
            # threshold).  Everything stays on-device between the two
            # dispatches; the feed contract is unchanged.
            self.plan_split = bool(plan_split)
            if self.plan_split:
                self._plan_step_dev = jax.jit(
                    partial(_sampled_plan_step_dev, self),
                    static_argnums=(0, 4))
                self._update_step_dev = jax.jit(
                    partial(_sampled_update_step_dev, self),
                    static_argnums=(0,), donate_argnums=(1, 2))

    # ------------------------------ setup -----------------------------------

    def _probe_caps(self, slack: float):
        """Derive frontier caps from a few probe plans (train batches +
        the widest eval batch per segment), padded by ``slack``."""
        it = self.data_iter
        caps = {"user": 0, "item": 0}

        def grow(plan):
            for chain in plan.chains:
                for f in chain.frontiers:
                    for t in ("user", "item"):
                        caps[t] = max(caps[t], int(f[t].size))

        rs = it.rating_sampler(batch_size=self.train_batch,
                               segment="train")
        recon = (it.recon_nodes_sampler(batch_size=self.s.recon_batch_size)
                 if self.s.use_dae else None)
        for _ in range(2):
            pairs, _ = next(rs)
            kw = {}
            if recon is not None:
                _, batch_ids, _ = next(recon)
                ru, ri = self._pad_recon(batch_ids)
                kw = dict(recon_user_ids=ru, recon_item_ids=ri)
            grow(StackedPlan.build(
                it.train_graph, self.model_cfg, pairs[0], pairs[1],
                fanout=self.fanout, sampler=self.samplers["train"], **kw))
        for seg in ("valid", "test"):
            pairs = (it.valid_node_pairs if seg == "valid"
                     else it.test_node_pairs)
            bs = min(self.train_batch, max(1, pairs.shape[1]))
            grow(StackedPlan.build(
                it.val_graph if seg == "valid" else it.test_graph,
                self.model_cfg, pairs[0, :bs], pairs[1, :bs],
                fanout=self.fanout, sampler=self.samplers[seg]))
        return {t: _round_up(int(v * slack), 256) for t, v in caps.items()}

    def _init_params(self):
        """Init the full-graph module on a tiny same-dims dummy graph —
        parameter shapes depend only on the node/link counts."""
        cfg = self.model_cfg
        rng = np.random.RandomState(0)
        n = 64
        gd = BipartiteGraphData.from_arrays(
            rng.randint(0, cfg.num_users, n),
            rng.randint(0, cfg.num_items, n),
            rng.randint(0, cfg.num_links, n),
            cfg.num_users, cfg.num_items, cfg.num_links, pad_multiple=64)
        B = 8
        model = STARGCN(cfg)
        kw = {}
        if cfg.use_fea_proj:
            kw = dict(user_features=jnp.asarray(self._fea[0]),
                      item_features=jnp.asarray(self._fea[1]))
        variables = model.init(
            {"params": jax.random.PRNGKey(self.s.seed),
             "dropout": jax.random.PRNGKey(1)},
            gd, gd.edge_pad_mask,
            jnp.zeros(cfg.num_users, jnp.int32),
            jnp.zeros(cfg.num_items, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32), train=False,
            **kw)
        return variables["params"]

    def set_lr(self, lr: float):
        self.lr = lr
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)

    # --------------------------- batch building ------------------------------

    def _pad_recon(self, batch_ids_dict):
        """Fixed-shape recon id arrays (pad with -1)."""
        nu, ni = self.names
        out = []
        for t, key in (("user", nu), ("item", ni)):
            cap = self.recon_cap[t]
            ids = np.asarray(batch_ids_dict.get(key, ()), np.int32)[:cap]
            arr = np.full(cap, -1, np.int32)
            arr[:ids.size] = ids
            out.append(arr)
        return out

    def _make_batch(self, rating_sampler, recon_sampler):
        """Host-only batch construction (runs in the prefetch thread; NO
        device ops here — device transfers from a non-main thread
        serialize pathologically on some runtimes).

        In ``plan_device`` mode this stops at the raw draws (pairs +
        noise + recon ids) — planning happens inside the jitted step."""
        pairs, gt = next(rating_sampler)
        n = gt.size
        B = self.train_batch_pad
        bu = np.zeros(B, np.int32)
        bi = np.zeros(B, np.int32)
        gt_pad = np.zeros(B, np.float32)
        valid = np.zeros(B, np.float32)
        bu[:n], bi[:n], gt_pad[:n], valid[:n] = (
            pairs[0], pairs[1], gt, 1.0)
        kw = {}
        noise_u = noise_i = None
        if recon_sampler is not None:
            noise_dict, batch_ids, _ = next(recon_sampler)
            nu, ni = self.names
            noise_u = noise_dict[nu].astype(np.int32)
            noise_i = noise_dict[ni].astype(np.int32)
            ru, ri = self._pad_recon(batch_ids)
            kw = dict(recon_user_ids=ru, recon_item_ids=ri)
        if noise_u is None:
            noise_u = np.arange(self.model_cfg.num_users, dtype=np.int32)
            noise_i = np.arange(self.model_cfg.num_items, dtype=np.int32)
        if self.plan_device:
            ru = kw.get("recon_user_ids", np.zeros(0, np.int32))
            ri = kw.get("recon_item_ids", np.zeros(0, np.int32))
            return {"bu": bu, "bi": bi, "gt": gt_pad, "valid": valid,
                    "noise_u": noise_u, "noise_i": noise_i,
                    "recon_u": np.asarray(ru, np.int32),
                    "recon_i": np.asarray(ri, np.int32)}
        exclude = (pairs[0], pairs[1]) if self.do_remove else None
        plan = StackedPlan.build(
            self.data_iter.train_graph, self.model_cfg, bu[:n], bi[:n],
            fanout=self.fanout, sampler=self.samplers["train"],
            exclude_pairs=exclude, **kw)
        return plan, (bu, bi), gt_pad, valid, noise_u, noise_i

    # ------------------------------ driving ----------------------------------

    def _pack_batch(self, batch):
        if self.plan_device:
            return pack_tree(batch)
        plan, (bu, bi), gt, valid, noise_u, noise_i = batch
        ht = plan.as_host_tree()
        # Replace the plan's (unpadded, variable-length) pairs_pos with
        # the padded-batch positions so the packed spec stays constant.
        ht["pairs_pos"] = _pairs_positions(plan, bu, bi)
        return pack_tree({
            "plan": ht, "noise_u": noise_u, "noise_i": noise_i,
            "gt": gt, "valid": valid})

    def _place_feed(self, ibuf, fbuf, chunked=False):
        """Mesh mode: shard the packed feed buffers over 'data' (padding
        the flat axis to a multiple of the axis size — unpack reads only
        the spec'd prefix, so trailing zeros are inert)."""
        if self.mesh is None:
            return ibuf, fbuf
        from stargcn_tpu.parallel.shardings import place
        dp = self.mesh.shape["data"]
        shard = self._chunk_feed_shard if chunked else self._feed_shard

        def one(a):
            pad = (-a.shape[-1]) % dp
            if pad:
                a = np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
            return place(a, shard)

        return one(ibuf), one(fbuf)

    # ---------------------- frontier-cap recovery ----------------------

    def _grow_caps(self, needed: dict, slack: float = 1.3):
        """Grow the frontier caps past an observed overflow and point
        every sampler at the new caps.  The next step's packed spec
        changes, so jit compiles ONE new program and the run continues —
        a rare large frontier must never be fatal mid-``fit``."""
        for t, n in needed.items():
            new = _round_up(int(n * slack), 256)
            if new > self.caps.get(t, 0):
                logging.warning(
                    "frontier cap for %r grew %d -> %d (overflow "
                    "recovery; one recompile)", t, self.caps.get(t), new)
                self.caps[t] = new
        for s in self.samplers.values():
            s.frontier_caps = self.caps

    def _replan(self, batch):
        """Rebuild a batch's plan under the CURRENT caps (same pairs,
        noise and recon ids; the neighborhoods are re-sampled)."""
        plan, (bu, bi), gt, valid, noise_u, noise_i = batch
        n = int(valid.sum())
        exclude = (bu[:n], bi[:n]) if self.do_remove else None
        kw = {}
        if self.recon_cap.get("user", 0) or self.recon_cap.get("item", 0):
            kw = dict(recon_user_ids=plan.recon_ids["user"],
                      recon_item_ids=plan.recon_ids["item"])
        new_plan = StackedPlan.build(
            self.data_iter.train_graph, self.model_cfg, bu[:n], bi[:n],
            fanout=self.fanout, sampler=self.samplers["train"],
            exclude_pairs=exclude, **kw)
        return new_plan, (bu, bi), gt, valid, noise_u, noise_i

    def _build_batch_safe(self, rating_sampler, recon_sampler):
        """``_make_batch`` with frontier-cap overflow recovery."""
        from stargcn_tpu.graph.sampling import FrontierCapError
        while True:
            try:
                return self._make_batch(rating_sampler, recon_sampler)
            except FrontierCapError as e:
                self._grow_caps(e.needed)

    def train_iteration(self, batch):
        self._rng_key, step_key = jax.random.split(self._rng_key)
        ibuf, fbuf, spec = self._pack_batch(batch)
        ibuf, fbuf = self._place_feed(ibuf, fbuf)
        if self.plan_device:
            caps = (self.caps["user"], self.caps["item"],
                    self.exclude_cap)
            if self.plan_split:
                dplan, pairs_pos, aux, feed, rng2 = self._plan_step_dev(
                    caps, self._dev_tables, ibuf, fbuf, spec, step_key)
                ident = tuple(
                    bool(min(self.caps[t], n) >= n)
                    and bool(self._dev_tables.ids_iota[i])
                    for i, (t, n) in enumerate(
                        (("user", self._dev_tables.n["user"]),
                         ("item", self._dev_tables.n["item"]))))
                self.params, self.opt_state, stats = \
                    self._update_step_dev(ident, self.params,
                                          self.opt_state, dplan,
                                          pairs_pos, aux, feed, rng2)
                return stats
            self.params, self.opt_state, stats = self._train_step_dev(
                caps, self.params, self.opt_state, self._dev_tables,
                ibuf, fbuf, spec, step_key)
            return stats
        self.params, self.opt_state, stats = self._train_step(
            self.params, self.opt_state, ibuf, fbuf, spec, step_key)
        return stats

    def train_chunk(self, batches):
        """k fused sampled steps in ONE device dispatch (``lax.scan``
        over the stacked packed-feed buffers).  Numerically identical
        to k ``train_iteration`` calls (same RNG key sequence); stats
        come back stacked along a leading k axis.  The full-graph
        ``Trainer.train_chunk`` is the same design (``train/loop.py``)."""
        k = len(batches)
        if self.plan_device and getattr(self, "plan_split", False):
            # split-dispatch mode: two programs per step cannot fuse
            # into one scan; dispatch steps back to back (they still
            # pipeline — nothing blocks until stats are fetched)
            stats_list = [self.train_iteration(b) for b in batches]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *stats_list)
        packed = [self._pack_batch(b) for b in batches]
        spec = packed[-1][2]
        if self.plan_device:
            ibufs = np.stack([p[0] for p in packed])
            fbufs = np.stack([p[1] for p in packed])
            keys = []
            for _ in range(k):
                self._rng_key, sk = jax.random.split(self._rng_key)
                keys.append(sk)
            if self._chunk_step_dev is None or self._chunk_k_dev != k:
                self._chunk_k_dev = k
                self._chunk_step_dev = jax.jit(
                    partial(_sampled_train_chunk_dev, self),
                    static_argnums=(0, 6), donate_argnums=(1, 2))
            ibufs, fbufs = self._place_feed(ibufs, fbufs, chunked=True)
            caps = (self.caps["user"], self.caps["item"],
                    self.exclude_cap)
            self.params, self.opt_state, stats = self._chunk_step_dev(
                caps, self.params, self.opt_state, self._dev_tables,
                ibufs, fbufs, spec, jnp.stack(keys))
            return stats
        if any(p[2] != spec for p in packed[:-1]):
            # Caps grew while the chunk was being built (overflow
            # recovery): re-plan the stale batches under the new caps so
            # the whole chunk shares one spec.
            batches = [b if packed[i][2] == spec else self._replan(b)
                       for i, b in enumerate(batches)]
            packed = [self._pack_batch(b) for b in batches]
            if any(p[2] != spec for p in packed):
                raise ValueError(
                    "train_chunk needs a constant packed spec across "
                    "the chunk (fixed caps/batch)")
        ibufs = np.stack([p[0] for p in packed])
        fbufs = np.stack([p[1] for p in packed])
        keys = []
        for _ in range(k):
            self._rng_key, sk = jax.random.split(self._rng_key)
            keys.append(sk)
        if self._chunk_step is None or self._chunk_k != k:
            self._chunk_k = k
            self._chunk_step = jax.jit(partial(_sampled_train_chunk, self),
                                       static_argnums=(4,),
                                       donate_argnums=(0, 1))
        ibufs, fbufs = self._place_feed(ibufs, fbufs, chunked=True)
        self.params, self.opt_state, stats = self._chunk_step(
            self.params, self.opt_state, ibufs, fbufs, spec,
            jnp.stack(keys))
        return stats

    def evaluate(self, segment: str = "valid"):
        """Per-block RMSE with fanout-sampled neighborhoods on the eval
        graph and cold-start eval noise (``STAR-GCN.py:465-498``)."""
        it = self.data_iter
        pairs = (it.valid_node_pairs if segment == "valid"
                 else it.test_node_pairs)
        ratings = (it.valid_ratings if segment == "valid"
                   else it.test_ratings)
        graph = it.val_graph if segment == "valid" else it.test_graph
        sampler = self.samplers[segment]
        nu, ni = self.names
        noise_u = np.asarray(it.evaluate_embed_noise_dict[nu], np.int32)
        noise_i = np.asarray(it.evaluate_embed_noise_dict[ni], np.int32)
        B = self.train_batch_pad
        sq_sum = np.zeros(self.model_cfg.nblocks)
        cnt = 0
        for start in range(0, pairs.shape[1], B):
            end = min(start + B, pairs.shape[1])
            n = end - start
            bu = np.zeros(B, np.int32)
            bi = np.zeros(B, np.int32)
            gt = np.zeros(B, np.float32)
            valid = np.zeros(B, np.float32)
            bu[:n], bi[:n] = pairs[0, start:end], pairs[1, start:end]
            gt[:n], valid[:n] = ratings[start:end], 1.0
            from stargcn_tpu.graph.sampling import FrontierCapError
            while True:
                try:
                    plan = StackedPlan.build(
                        graph, self.model_cfg, bu[:n], bi[:n],
                        fanout=self.fanout, sampler=sampler)
                    break
                except FrontierCapError as e:
                    self._grow_caps(e.needed)
            ht = plan.as_host_tree()
            ht["pairs_pos"] = _pairs_positions(plan, bu, bi)
            ibuf, fbuf, spec = pack_tree({
                "plan": ht, "noise_u": noise_u, "noise_i": noise_i,
                "gt": gt, "valid": valid})
            ibuf, fbuf = self._place_feed(ibuf, fbuf)
            block_sq = self._eval_step(self.params, ibuf, fbuf, spec)
            sq_sum += np.asarray(block_sq)
            cnt += n
        return np.sqrt(sq_sum / max(cnt, 1))

    # -------------------------------- fit ------------------------------------

    def fit(self, max_iter: Optional[int] = None, log=logging.info,
            prefetch: bool = False, prefetch_omp_threads: int = 2):
        """The reference training schedule (``STAR-GCN.py:507-713``) over
        sampled mini-batches.

        ``prefetch`` overlaps host plan building with the device step in
        a one-ahead producer thread.  Default OFF: on few-core hosts
        driving a remote TPU the producer starves the dispatch path
        (measured 2.0-19 s/step prefetched vs 0.32 s serial on a 4-core
        host at ML-10M, fanout 8) — opt in only when host cores
        comfortably exceed the OpenMP thread cap.  The producer caps its
        own OpenMP teams at ``prefetch_omp_threads`` (per-thread ICV —
        main-thread kernel calls keep the full cap) so planner teams
        stop oversubscribing dispatch cores; libgomp's spin-waits are
        the other half of the round-2 finding, so a prefetching launch
        should also set ``OMP_WAIT_POLICY=PASSIVE``/``GOMP_SPINCOUNT=0``
        in the environment (startup-read; the CLI ``--prefetch`` path
        does this before JAX import)."""
        s = self.s
        it = self.data_iter
        max_iter = max_iter or s.max_iter
        rating_sampler = it.rating_sampler(batch_size=self.train_batch,
                                           segment="train")
        recon_sampler = (it.recon_nodes_sampler(
            batch_size=s.recon_batch_size) if s.use_dae else None)

        if self.save_dir is not None:
            from stargcn_tpu.utils.model_info import model_info
            model_info(self.params, os.path.join(
                self.save_dir, f"net{self.save_id}.txt"))
        loggers = make_metric_loggers(self.save_dir, self.save_id,
                                      self.model_cfg.nblocks)
        nb = self.model_cfg.nblocks
        best_valid_rmse = np.inf
        best_test_rmse = None
        best_iter = -1
        no_better = 0
        stop = False
        t_start = time.time()
        pending = []
        pending_cnt = 0

        stop_evt = threading.Event()
        if prefetch:
            q: queue.Queue = queue.Queue(maxsize=2)

            def producer():
                from stargcn_tpu.graph import kernels
                kernels.set_omp_threads(prefetch_omp_threads)
                while not stop_evt.is_set():
                    item = self._build_batch_safe(rating_sampler,
                                                  recon_sampler)
                    while not stop_evt.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue

            threading.Thread(target=producer, daemon=True).start()
            next_batch = q.get
        else:
            def next_batch():
                return self._build_batch_safe(rating_sampler,
                                              recon_sampler)

        # Steps fused per dispatch via train_chunk when the logging/eval
        # cadence allows (numerically identical — same RNG sequence;
        # mirrors the full-graph Trainer.fit scan fusion).
        k = s.scan_steps if (s.scan_steps > 1
                             and s.log_interval % s.scan_steps == 0
                             and s.valid_interval % s.scan_steps == 0
                             and max_iter >= s.scan_steps) else 1
        try:
            iter_idx = 0
            while iter_idx < max_iter:
                if k == 1:
                    stats = self.train_iteration(next_batch())
                else:
                    stats = self.train_chunk(
                        [next_batch() for _ in range(k)])
                iter_idx += k
                pending.append(stats)
                pending_cnt += self.train_batch * k
                if len(pending) > 16:
                    # Bound in-flight dispatches: each queued step pins
                    # its packed feed (plan + full-size noise arrays) in
                    # HBM until it executes — unbounded async dispatch
                    # OOMs at beyond-HBM graph scales.  Waiting on the
                    # oldest unfinished step keeps the pipeline full.
                    jax.block_until_ready(pending[-16]["loss"])

                logging_str = ""
                if iter_idx % s.log_interval == 0:
                    # chunked stats carry a leading k axis; reshape makes
                    # the reduction uniform across k == 1 and k > 1
                    fetched = jax.device_get(pending)
                    if self.plan_device:
                        # device-planned overflow recovery: rejected
                        # (no-op) steps reported their needed frontier
                        # sizes; grow caps here (one recompile) and
                        # training continues — the async-dispatch
                        # analogue of the host path's FrontierCapError.
                        n_over = sum(int(np.asarray(f["overflow"]).sum())
                                     for f in fetched)
                        if n_over:
                            need = {
                                t: int(max(np.asarray(
                                    f[f"needed_{t}"]).max()
                                    for f in fetched))
                                for t in ("user", "item")}
                            need_ex = int(max(np.asarray(
                                f["needed_exclude"]).max()
                                for f in fetched))
                            log(f"{n_over} step(s) skipped on frontier-"
                                f"cap overflow; growing caps to cover "
                                f"{need} / exclude {need_ex}")
                            self._grow_caps(need)
                            if need_ex > self.exclude_cap:
                                self.exclude_cap = 2 * need_ex
                    sq = sum(np.asarray(f["sq_err"]).reshape(-1, nb).sum(0)
                             for f in fetched)
                    rl = sum(np.asarray(
                        f["rating_loss"]).reshape(-1, nb).sum(0)
                        for f in fetched)
                    cl = sum(np.asarray(
                        f["recon_loss"]).reshape(-1, nb).sum(0)
                        for f in fetched)
                    gn = sum(float(np.asarray(f["gnorm"]).sum())
                             for f in fetched)
                    last_loss = float(
                        np.asarray(fetched[-1]["loss"]).reshape(-1)[-1])
                    n_batches = sum(int(np.asarray(f["gnorm"]).size)
                                    for f in fetched)
                    pending, n_pairs = [], pending_cnt
                    pending_cnt = 0
                    if not np.isfinite(last_loss):
                        log(f"Non-finite loss at iter {iter_idx}; "
                            "restoring best checkpoint and halving LR.")
                        ckpt = (os.path.join(
                            self.save_dir,
                            f"ckpt_best_{self.save_id}.msgpack")
                            if self.save_dir else None)
                        if ckpt and os.path.exists(ckpt):
                            self.restore_checkpoint(ckpt)
                        self.set_lr(max(self.lr * 0.5, s.min_lr))
                        continue
                    rmse = np.sqrt(sq / max(n_pairs, 1))
                    row = {"iter": iter_idx, "loss": last_loss}
                    for i in range(nb):
                        row[f"rmse{i}"] = rmse[i]
                        row[f"rating_loss{i}"] = rl[i] / n_batches
                        row[f"recon_loss{i}"] = cl[i] / n_batches
                    loggers["train"].log(**row)
                    dt = time.time() - t_start
                    logging_str = (
                        f"Iter={iter_idx}, gnorm={gn/n_batches:.3f}, "
                        f"loss={last_loss:.3f}, "
                        + ", ".join(f"RMSE{i}={rmse[i]:.3f}"
                                    for i in range(nb))
                        + f", {n_pairs/dt:.0f} pairs/s")
                    t_start = time.time()

                if iter_idx % s.valid_interval == 0:
                    valid_rmse = self.evaluate("valid")
                    loggers["valid"].log(**{"iter": iter_idx, **{
                        f"rmse{i}": valid_rmse[i] for i in range(nb)}})
                    logging_str += ", " + ", ".join(
                        f"Val RMSE{i}={valid_rmse[i]:.3f}"
                        for i in range(nb))
                    if valid_rmse[-1] < best_valid_rmse:
                        best_valid_rmse = valid_rmse[-1]
                        no_better = 0
                        best_iter = iter_idx
                        best_test_rmse = self.evaluate("test")
                        loggers["test"].log(**{"iter": iter_idx, **{
                            f"rmse{i}": best_test_rmse[i]
                            for i in range(nb)}})
                        logging_str += ", " + ", ".join(
                            f"Test RMSE{i}={best_test_rmse[i]:.4f}"
                            for i in range(nb))
                        self.save_checkpoint("best")
                    else:
                        no_better += 1
                        if (no_better > s.early_stopping_patience
                                and self.lr <= s.min_lr):
                            log("Early stopping threshold reached.")
                            stop = True
                        elif no_better > s.decay_patience:
                            new_lr = max(self.lr * s.lr_decay_factor,
                                         s.min_lr)
                            if new_lr < self.lr:
                                log(f"\tChange the LR to {new_lr:g}")
                                self.set_lr(new_lr)
                                no_better = 0
                if logging_str:
                    log(logging_str)
                if stop:
                    break
        finally:
            stop_evt.set()
        for lg in loggers.values():
            lg.close()
        self.save_checkpoint("last")
        log(f"Best Iter={best_iter}, "
            f"Best Valid RMSE={best_valid_rmse:.4f}, "
            + (", ".join(f"Best Test RMSE{i}={best_test_rmse[i]:.4f}"
                         for i in range(nb))
               if best_test_rmse is not None else "no test eval"))
        return {"best_iter": best_iter,
                "best_valid_rmse": float(best_valid_rmse),
                "best_test_rmse": (None if best_test_rmse is None
                                   else [float(x) for x in best_test_rmse])}

    # ---------------------------- checkpointing ------------------------------

    def save_checkpoint(self, tag: str = "last"):
        if self.save_dir is None:
            return None
        from stargcn_tpu.train.checkpoint import save_checkpoint
        path = os.path.join(self.save_dir,
                            f"ckpt_{tag}_{self.save_id}.msgpack")
        save_checkpoint(path, self.params, self.opt_state,
                        {"lr": self.lr})
        return path

    def restore_checkpoint(self, path: str):
        from stargcn_tpu.train.checkpoint import restore_checkpoint
        self.params, self.opt_state, extra = restore_checkpoint(
            path, self.params, self.opt_state)
        if "lr" in extra:
            self.set_lr(float(extra["lr"]))


# ------------------------- jitted step functions -----------------------------


def _pairs_positions(plan, bu, bi):
    """Positions of the (padded) batch pairs in each block's top
    frontier, as host numpy arrays — they ship inside the packed feed
    (padded slots resolve to position 0 and are masked by ``valid``)."""
    out = []
    for b, chain in enumerate(plan.chains):
        top = chain.frontiers[-1]

        def pos_of(ids, arr):
            size = int(max(arr.max(initial=0), ids.max(initial=0))) + 1
            pmap = np.zeros(size + 1, np.int32)
            ok = arr >= 0
            pmap[arr[ok]] = np.nonzero(ok)[0]
            return pmap[np.minimum(ids, size)].astype(np.int32)

        out.append({"user": pos_of(bu, top["user"]),
                    "item": pos_of(bi, top["item"])})
    return out


def _sampled_outputs(trainer, params, dplan, pairs_pos, noise_u, noise_i,
                     *, train, rng=None, identity=None):
    cfg = trainer.model_cfg
    dplan = dict(dplan)
    dplan["pairs_pos"] = pairs_pos
    backend = (trainer.backend if train
               else getattr(trainer, "eval_backend", trainer.backend))
    return sampled_forward(params, cfg, dplan, noise_u, noise_i,
                           backend=backend, train=train,
                           dropout_rng=rng, features=trainer._fea,
                           row_sharding=trainer._row_shard,
                           identity_frontiers=identity,
                           remat=trainer.remat)


def _sampled_train_step(trainer, params, opt_state, ibuf, fbuf, spec, rng):
    feed = unpack_tree(ibuf, fbuf, spec)
    dplan = feed["plan"]
    pairs_pos = dplan["pairs_pos"]
    noise_u, noise_i = feed["noise_u"], feed["noise_i"]
    gt_ratings, pairs_valid = feed["gt"], feed["valid"]
    return _loss_update(trainer, params, opt_state, dplan, pairs_pos,
                        noise_u, noise_i, gt_ratings, pairs_valid, rng)


def _loss_update(trainer, params, opt_state, dplan, pairs_pos, noise_u,
                 noise_i, gt_ratings, pairs_valid, rng, identity=None):
    """Shared loss + Adam update over a plan pytree — the host-planned
    and device-planned steps differ only in where ``dplan`` came from."""
    cfg = trainer.model_cfg
    s = trainer.s
    mean, std = trainer.rating_mean, trainer.rating_std
    n_valid = jnp.maximum(pairs_valid.sum(), 1.0)

    def loss_fn(p):
        out = _sampled_outputs(trainer, p, dplan, pairs_pos, noise_u,
                               noise_i, train=True, rng=rng,
                               identity=identity)
        target = (gt_ratings - mean) / std
        sq = (out["pred_ratings"] - target[None, :]) ** 2
        rating_loss = 0.5 * jnp.sum(sq * pairs_valid[None, :],
                                    axis=1) / n_valid
        loss = rating_loss.sum()
        recon_loss = jnp.zeros(cfg.nblocks)
        if s.use_dae and out["pred_embed"]:
            rls = []
            for blk, ok in zip(out["pred_embed"], out["recon_ok"]):
                block_loss = 0.0
                for t in ("user", "item"):
                    d = jnp.sum((blk[t] - out["gt_embed"][t]) ** 2,
                                axis=-1)
                    block_loss += (jnp.sum(d * ok[t])
                                   / jnp.maximum(ok[t].sum(), 1.0))
                rls.append(block_loss)
            recon_loss = jnp.stack(rls)
            loss = loss + s.recon_lambda * recon_loss.sum()
        denorm = out["pred_ratings"] * std + mean
        sq_err = jnp.sum((denorm - gt_ratings[None, :]) ** 2
                         * pairs_valid[None, :], axis=1)
        return loss, (rating_loss, recon_loss, sq_err)

    (loss, (rating_loss, recon_loss, sq_err)), grads = \
        jax.value_and_grad(loss_fn, has_aux=True)(params)
    gnorm = optax.global_norm(grads)
    updates, opt_state = trainer.opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    stats = {"loss": loss, "gnorm": gnorm, "rating_loss": rating_loss,
             "recon_loss": recon_loss, "sq_err": sq_err}
    return params, opt_state, stats


def _sampled_train_chunk(trainer, params, opt_state, ibufs, fbufs, spec,
                         keys):
    def step(carry, xs):
        p, o = carry
        ib, fb, rng = xs
        p, o, stats = _sampled_train_step(trainer, p, o, ib, fb, spec, rng)
        return (p, o), stats

    (params, opt_state), stats = jax.lax.scan(
        step, (params, opt_state), (ibufs, fbufs, keys))
    return params, opt_state, stats


def _device_plan_phase(trainer, caps, tab, feed, rng):
    """In-jit planning phase shared by the fused and split device
    steps: batch ids -> full stacked-plan pytree via ``DevicePlanner``."""
    from stargcn_tpu.graph.device_sampling import DevicePlanner

    bu_ind = jnp.take(tab.id2ind["user"], feed["bu"])
    bi_ind = jnp.take(tab.id2ind["item"], feed["bi"])
    rng, plan_key = jax.random.split(rng)
    planner = DevicePlanner(
        trainer.model_cfg, {"user": caps[0], "item": caps[1]},
        trainer.fanout, symm=trainer.model_cfg.agg_norm_symm,
        exclude_cap=caps[2])
    dplan, pairs_pos, aux = planner.build(
        tab, plan_key, bu_ind, bi_ind, feed["valid"],
        feed["recon_u"], feed["recon_i"], exclude=trainer.do_remove)
    return dplan, pairs_pos, aux, rng


def _device_update_phase(trainer, params, opt_state, dplan, pairs_pos,
                         aux, feed, rng, identity):
    """Loss + Adam update over a device-built plan, with the in-program
    overflow rejection contract (parameters pass through unchanged on
    an overflowed step; stats report the needed sizes)."""
    new_params, new_opt, stats = _loss_update(
        trainer, params, opt_state, dplan, pairs_pos, feed["noise_u"],
        feed["noise_i"], feed["gt"], feed["valid"], rng,
        identity=identity)
    keep = jnp.logical_not(aux["overflow"])
    params = jax.tree.map(lambda n, o: jnp.where(keep, n, o),
                          new_params, params)
    opt_state = jax.tree.map(lambda n, o: jnp.where(keep, n, o),
                             new_opt, opt_state)
    # zero the contribution of a rejected step so the driver's logging
    # sums stay clean (loss stays reported for visibility)
    for k in ("sq_err", "rating_loss", "recon_loss", "gnorm"):
        stats[k] = stats[k] * keep.astype(stats[k].dtype)
    stats["overflow"] = aux["overflow"]
    stats["needed_user"] = aux["needed_user"]
    stats["needed_item"] = aux["needed_item"]
    stats["needed_exclude"] = aux["needed_exclude"]
    return params, opt_state, stats


def _sampled_train_step_dev(trainer, caps, params, opt_state, tab, ibuf,
                            fbuf, spec, rng):
    """Device-planned step: the ENTIRE planning phase (frontier
    construction, fanout sampling, dedup, supports, REMOVE_RATING,
    position maps) runs inside this jit via ``DevicePlanner`` — the feed
    is just pair ids + noise + recon ids (~0.4 MB vs ~15 MB of host
    plan at ML-10M).  An overflowed frontier cap rejects the whole
    update in-program (parameters pass through) and reports the needed
    sizes in the stats, so the driver can grow caps and recompile
    without ever training on a truncated plan."""
    feed = unpack_tree(ibuf, fbuf, spec)
    dplan, pairs_pos, aux, rng = _device_plan_phase(trainer, caps, tab,
                                                    feed, rng)
    return _device_update_phase(trainer, params, opt_state, dplan,
                                pairs_pos, aux, feed, rng,
                                aux["identity"])


def _sampled_plan_step_dev(trainer, caps, tab, ibuf, fbuf, spec, rng):
    """Split-dispatch program 1 (beyond-HBM scales): planning only.
    Outputs stay device-resident for program 2; ``aux['identity']``
    (static python bools) is stripped — the split update receives it as
    a static argument instead."""
    feed = unpack_tree(ibuf, fbuf, spec)
    dplan, pairs_pos, aux, rng = _device_plan_phase(trainer, caps, tab,
                                                    feed, rng)
    aux = {k: v for k, v in aux.items() if k != "identity"}
    return dplan, pairs_pos, aux, feed, rng


def _sampled_update_step_dev(trainer, identity_t, params, opt_state,
                             dplan, pairs_pos, aux, feed, rng):
    """Split-dispatch program 2: model update over the device-resident
    plan.  ``identity_t`` = (user, item) identity-frontier bools,
    static (hashable) so a cap growth that flips them retraces."""
    identity = {"user": identity_t[0], "item": identity_t[1]}
    return _device_update_phase(trainer, params, opt_state, dplan,
                                pairs_pos, aux, feed, rng, identity)


def _sampled_train_chunk_dev(trainer, caps, params, opt_state, tab, ibufs,
                             fbufs, spec, keys):
    def step(carry, xs):
        p, o = carry
        ib, fb, rng = xs
        p, o, stats = _sampled_train_step_dev(trainer, caps, p, o, tab,
                                              ib, fb, spec, rng)
        return (p, o), stats

    (params, opt_state), stats = jax.lax.scan(
        step, (params, opt_state), (ibufs, fbufs, keys))
    return params, opt_state, stats


def _sampled_eval_step(trainer, params, ibuf, fbuf, spec):
    feed = unpack_tree(ibuf, fbuf, spec)
    dplan = feed["plan"]
    pairs_pos = dplan["pairs_pos"]
    noise_u, noise_i = feed["noise_u"], feed["noise_i"]
    gt_ratings, valid = feed["gt"], feed["valid"]
    out = _sampled_outputs(trainer, params, dplan, pairs_pos, noise_u,
                           noise_i, train=False)
    denorm = out["pred_ratings"] * trainer.rating_std + trainer.rating_mean
    clipped = jnp.clip(denorm, trainer.rating_min, trainer.rating_max)
    sq = (clipped - gt_ratings[None, :]) ** 2
    return jnp.sum(sq * valid[None, :], axis=1)

"""Full-graph training/evaluation engine for STAR-GCN on TPU.

Re-implementation of the reference experiment driver
(``experiments/STAR-GCN.py:465-713``: ``train()``/``evaluate()``) around a
single jitted train step and a single jitted eval step:

* graph variants (train/val/test) are edge masks over one static edge
  array (the reference materialises three ``HeterGraph`` objects,
  ``iterators.py:165-176``);
* per-iteration batch-edge removal (``REMOVE_RATING``,
  ``STAR-GCN.py:595-600``) is an in-jit binary-search + scatter instead of
  a C++ CSR rebuild;
* loss = sum over blocks of L2(pred, (r-mean)/std) (gluon ``L2Loss``
  carries a 1/2 factor) + RECON_LAMBDA * sum over blocks/types of
  mean-over-nodes ||e_hat - e||^2 (``STAR-GCN.py:610-628``);
* gradient global-norm clipping (``utils.py:104-107``), Adam, and the
  patience-driven LR decay x0.5 to MIN_LR with early stopping
  (``STAR-GCN.py:694-705``).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stargcn_tpu.graph.device import BipartiteGraphData
from stargcn_tpu.models.stargcn import STARGCN, STARGCNConfig
from stargcn_tpu.utils.logging import MetricLogger


def resolve_backend(backend: str, num_links, num_users, num_items) -> str:
    """'auto' picks the dense MXU backend when the (R, Nu, Ni) support
    tensor is small enough to live in HBM comfortably, else the
    bit-packed dense Pallas path (``ops/bitdense.py`` — 1 bit/entry,
    pure MXU; measured 1.9x the chunked-ELL gather path at ML-10M,
    which remains available as KERNEL.BACKEND='ell').  The 'pallas'
    ELL kernels serve the SAMPLED mini-batch mode
    (``models/sampled.py``); for the full-graph model they fall back
    to 'xla'."""
    if backend == "pallas":
        logging.warning("KERNEL.BACKEND 'pallas' applies to the sampled "
                        "mode; full-graph training uses 'xla'.")
        return "xla"
    if backend != "auto":
        return backend
    entries = num_links * num_users * num_items
    return "dense" if entries <= 150_000_000 else "bitdense"


def resolve_edge_chunk(backend, num_edges, agg_units,
                       budget_mb: int = 1500):
    """Bound the xla path's (E, units) message buffer to ``budget_mb``
    (KERNEL.XLA_MSG_BUDGET_MB, default ~1.5 GB) by processing edges in
    rematerialised chunks on big graphs."""
    if backend != "xla" or not num_edges:
        return None
    units = max(agg_units)
    budget = int(budget_mb) * 10**6
    if num_edges * units * 4 <= budget:
        return None
    chunk = max(budget // (units * 4), 65536)
    return (chunk // 65536) * 65536


def build_model_config(cfg, num_users, num_items, num_links,
                       num_edges=None) -> STARGCNConfig:
    """Translate the experiment config tree into a STARGCNConfig."""
    backend = resolve_backend(cfg.KERNEL.BACKEND, num_links,
                              num_users, num_items)
    dropout_per_edge = cfg.GCN.get("DROPOUT_PER_EDGE", False)
    if dropout_per_edge and backend != "xla":
        logging.warning("GCN.DROPOUT_PER_EDGE forces the flat-edge "
                        "(xla) backend (was %r)", backend)
        backend = "xla"
    return STARGCNConfig(
        num_users=num_users, num_items=num_items, num_links=num_links,
        use_embed=cfg.MODEL.USE_EMBED,
        use_fea_proj=cfg.MODEL.USE_FEA_PROJ,
        recon_fea=cfg.MODEL.RECON_FEA,
        use_dae=cfg.MODEL.USE_DAE,
        nblocks=cfg.MODEL.NBLOCKS,
        use_recurrent=cfg.MODEL.USE_RECURRENT,
        activation=cfg.MODEL.ACTIVATION,
        fea_mid_map=cfg.FEA.MID_MAP,
        fea_units=cfg.FEA.UNITS,
        embed_units=cfg.EMBED.UNITS,
        gcn_dropout=cfg.GCN.DROPOUT,
        gcn_use_recurrent=cfg.GCN.USE_RECURRENT,
        agg_norm_symm=cfg.GCN.AGG.NORM_SYMM,
        agg_units=tuple(cfg.GCN.AGG.UNITS),
        agg_accum=cfg.GCN.AGG.ACCUM,
        agg_ordinal_sharing=cfg.GCN.AGG.get("ORDINAL_SHARING", False),
        out_units=tuple(cfg.GCN.OUT.UNITS),
        gen_rating_mid_map=cfg.GEN_RATING.MID_MAP,
        backend=backend,
        edge_chunk=resolve_edge_chunk(
            backend, num_edges, tuple(cfg.GCN.AGG.UNITS),
            budget_mb=cfg.KERNEL.get("XLA_MSG_BUDGET_MB", 1500)),
        ell_k=cfg.KERNEL.get("ELL_K", 64),
        ell_chunk=cfg.KERNEL.get("ELL_CHUNK", 16384),
        ell_bf16=cfg.KERNEL.get("ELL_BF16", False),
        bit_impl=cfg.KERNEL.get("BIT_IMPL", "auto"),
        dropout_per_edge=dropout_per_edge,
        self_noise_only=cfg.MODEL.get("SELF_NOISE_ONLY", True),
        compute_dtype=cfg.MODEL.get("COMPUTE_DTYPE", "float32"),
    )


class _LazyEllPacks:
    """Per-variant chunked-ELL packs, built (and cached) on first use."""

    def __init__(self, graph_data, model_cfg):
        self._g = graph_data
        self._cfg = model_cfg
        self._cache = {}

    def get(self, variant, mask):
        if variant not in self._cache:
            from stargcn_tpu.ops.chunked_ell import build_ell_pack

            g = self._g
            pad = np.asarray(g.edge_pad_mask)
            self._cache[variant] = build_ell_pack(
                g.edge_user, g.edge_item, g.edge_rating,
                np.asarray(mask) * pad, self._cfg.num_users,
                self._cfg.num_items, K=self._cfg.ell_k)
        return self._cache[variant]


class _LazyBitPacks:
    """Per-variant bit-packed dense adjacencies (ops/bitdense.py), built
    (and cached) on first use — ~2 GB of HBM per variant at ML-10M
    scale, so valid/test variants wait for the first eval AND identical
    masks share one pack (transductively the valid graph IS the train
    graph: ``iterators.py:165-169``)."""

    def __init__(self, graph_data, model_cfg, shardings=None):
        self._g = graph_data
        self._cfg = model_cfg
        self._shardings = shardings
        self._cache = {}       # mask-bytes digest -> pack
        self._by_variant = {}

    def get(self, variant, mask):
        if variant not in self._by_variant:
            import hashlib

            from stargcn_tpu.ops import bitdense as bd

            g = self._g
            pad = np.asarray(g.edge_pad_mask)
            m = np.ascontiguousarray(np.asarray(mask) * pad, np.float32)
            key = hashlib.sha1(m.tobytes()).hexdigest()
            if key not in self._cache:
                # Pack layout must match the kernel the model resolves
                # to (the 16-bit kernels read row-interleaved packs).
                impl = bd.resolve_impl(self._cfg.bit_impl)
                ril = bd._BM if impl == "pallas16" else 0
                pack = bd.build_bit_pack(
                    g.edge_user, g.edge_item, g.edge_rating, m,
                    self._cfg.num_users, self._cfg.num_items,
                    g.num_links, row_interleave=ril)
                if self._shardings is not None:
                    pack = self._shardings.place_bit_pack(pack)
                self._cache[key] = pack
            self._by_variant[variant] = self._cache[key]
        return self._by_variant[variant]


@dataclasses.dataclass
class TrainSettings:
    rating_batch_size: int = 10000
    recon_batch_size: int = 1_000_000
    max_iter: int = 1_000_000
    log_interval: int = 10
    valid_interval: int = 10
    lr: float = 1e-2
    wd: float = 0.0
    decay_patience: int = 100
    min_lr: float = 5e-4
    lr_decay_factor: float = 0.5
    early_stopping_patience: int = 150
    grad_clip: float = 10.0
    remove_rating: bool = True
    recon_lambda: float = 0.1
    use_dae: bool = True
    seed: int = 123
    # Steps fused into one device dispatch via lax.scan (amortises
    # per-dispatch overhead; must divide log/valid intervals to keep the
    # logging cadence exact).
    scan_steps: int = 1
    # Failure detection / elastic recovery (train/resilience.py):
    # stall-diagnosis timeout, bounded step-exception restarts, bounded
    # NaN-divergence recoveries.  0 disables the heartbeat monitor.
    hang_timeout_s: float = 900.0
    max_restarts: int = 2
    max_nan_recoveries: int = 3
    # Sample rating batches + recon noise ON DEVICE inside the fused
    # scan (single-chip fast path: zero per-step host->device
    # transfers).  Distributional deltas vs the host samplers are
    # documented at _device_sample_step_inputs.
    device_sampler: bool = False

    @staticmethod
    def from_cfg(cfg):
        return TrainSettings(
            rating_batch_size=cfg.TRAIN.RATING_BATCH_SIZE,
            recon_batch_size=cfg.TRAIN.RECON_BATCH_SIZE,
            max_iter=cfg.TRAIN.MAX_ITER,
            log_interval=cfg.TRAIN.LOG_INTERVAL,
            valid_interval=cfg.TRAIN.VALID_INTERVAL,
            lr=cfg.TRAIN.LR, wd=cfg.TRAIN.WD,
            decay_patience=cfg.TRAIN.DECAY_PATIENCE,
            min_lr=cfg.TRAIN.MIN_LR,
            lr_decay_factor=cfg.TRAIN.LR_DECAY_FACTOR,
            early_stopping_patience=cfg.TRAIN.EARLY_STOPPING_PATIENCE,
            grad_clip=cfg.TRAIN.GRAD_CLIP,
            remove_rating=cfg.MODEL.REMOVE_RATING,
            recon_lambda=cfg.MODEL.RECON_LAMBDA,
            use_dae=cfg.MODEL.USE_DAE,
            seed=cfg.SEED,
            scan_steps=cfg.TRAIN.get("SCAN_STEPS", 1),
            hang_timeout_s=cfg.TRAIN.get("HANG_TIMEOUT_S", 900.0),
            max_restarts=cfg.TRAIN.get("MAX_RESTARTS", 2),
            max_nan_recoveries=cfg.TRAIN.get("MAX_NAN_RECOVERIES", 3),
            device_sampler=cfg.TRAIN.get("DEVICE_SAMPLER", False),
        )


def make_optimizer(settings):
    """Global-norm clip + Adam (+ optional weight decay) with an
    adjustable learning rate (``optax.inject_hyperparams``) — the
    reference trainer's optimiser contract (``STAR-GCN.py:568-576,630``).
    """
    s = settings

    def make(learning_rate):
        parts = [optax.clip_by_global_norm(s.grad_clip),
                 optax.scale_by_adam()]
        if s.wd:
            parts.append(optax.add_decayed_weights(s.wd))
        parts.append(optax.scale(-learning_rate))
        return optax.chain(*parts)

    return optax.inject_hyperparams(make)(learning_rate=s.lr)


def make_metric_loggers(save_dir, save_id, nblocks):
    """train/valid/test MetricLogger CSVs
    (``train_loss%d.csv``/``valid_loss%d.csv``/``test_loss%d.csv``,
    reference ``STAR-GCN.py:555-566``); no-op loggers without a
    save_dir."""
    if save_dir is None:
        class _Null:
            def log(self, **kw):
                pass

            def close(self):
                pass
        return {k: _Null() for k in ("train", "valid", "test")}
    os.makedirs(save_dir, exist_ok=True)
    cols = ["iter", "loss"] + sum(
        [[f"rmse{i}", f"rating_loss{i}", f"recon_loss{i}"]
         for i in range(nblocks)], [])
    fmts = ["%d", "%.4f"] + ["%.4f"] * (3 * nblocks)
    return {
        "train": MetricLogger(cols, fmts, os.path.join(
            save_dir, f"train_loss{save_id}.csv")),
        "valid": MetricLogger(
            ["iter"] + [f"rmse{i}" for i in range(nblocks)],
            ["%d"] + ["%.4f"] * nblocks,
            os.path.join(save_dir, f"valid_loss{save_id}.csv")),
        "test": MetricLogger(
            ["iter"] + [f"rmse{i}" for i in range(nblocks)],
            ["%d"] + ["%.4f"] * nblocks,
            os.path.join(save_dir, f"test_loss{save_id}.csv")),
    }


class Trainer:
    """Owns the jitted step functions and the host-side schedule."""

    def __init__(self, model_cfg: STARGCNConfig, data_iter, settings,
                 save_dir: Optional[str] = None, save_id: int = 0,
                 mesh=None):
        self.model_cfg = model_cfg
        self.model = STARGCN(model_cfg)
        self.data_iter = data_iter
        self.s = settings
        self.save_dir = save_dir
        self.save_id = save_id
        self.mesh = mesh
        self.shardings = None
        if mesh is not None:
            from stargcn_tpu.parallel.shardings import GraphShardings
            self.shardings = GraphShardings(mesh)

        all_csr = data_iter.all_graph["user", "movie"]
        self.graph_data = BipartiteGraphData.from_csr(all_csr)
        if self.shardings is not None:
            self.graph_data = self.shardings.place_graph(self.graph_data)
        self.edge_masks = self._build_variant_masks(all_csr)
        if self.shardings is not None:
            from stargcn_tpu.parallel.shardings import place
            self.edge_masks = {
                k: place(v, self.shardings.edges)
                for k, v in self.edge_masks.items()}
        # Static per-variant dense adjacencies + degree vectors for the
        # MXU backend — the O(E) scatters the naive path paid EVERY step.
        self.dense_adj = None
        self.variant_degrees = None
        self.ell_packs = None
        if model_cfg.backend == "dense":
            from stargcn_tpu.ops.agg import build_dense_adjacency

            g = self.graph_data
            build = jax.jit(lambda m: build_dense_adjacency(
                g.edge_item, g.edge_user, g.edge_rating,
                m * g.edge_pad_mask, g.num_links, g.num_users,
                g.num_items))
            self.dense_adj = {k: build(v)
                              for k, v in self.edge_masks.items()}
        if model_cfg.backend == "ell":
            # Static per-variant chunked-ELL packs (ops/chunked_ell.py),
            # built LAZILY per variant: the train pack is needed
            # immediately, the valid/test packs only at the first
            # evaluation — and each variant is ~300 MB of device
            # transfers at ML-10M scale, which dominates construction.
            self.ell_packs = _LazyEllPacks(self.graph_data, model_cfg)
        if model_cfg.backend == "bitdense":
            # Bit-packed dense adjacencies (ops/bitdense.py), same lazy
            # per-variant pattern.  (self.ell_packs is the generic
            # "static aggregation pack" provider slot.)
            self.ell_packs = _LazyBitPacks(self.graph_data, model_cfg,
                                           self.shardings)
        if model_cfg.backend in ("dense", "ell", "bitdense"):
            eu = np.asarray(self.graph_data.edge_user)
            ei = np.asarray(self.graph_data.edge_item)
            pad = np.asarray(self.graph_data.edge_pad_mask)
            self.variant_degrees = {}
            for k, m in self.edge_masks.items():
                mm = np.asarray(m) * pad
                du = np.zeros(model_cfg.num_users, np.float32)
                di = np.zeros(model_cfg.num_items, np.float32)
                np.add.at(du, eu, mm)
                np.add.at(di, ei, mm)
                self.variant_degrees[k] = (jnp.asarray(du),
                                           jnp.asarray(di))

        train_ratings = data_iter.train_ratings
        self.rating_mean = float(train_ratings.mean())
        self.rating_std = float(train_ratings.std())
        vals = data_iter.possible_rating_values
        self.rating_min = float(vals.min())
        self.rating_max = float(vals.max())

        n_train = data_iter.train_node_pairs.shape[1]
        self.train_batch = min(self.s.rating_batch_size, n_train)
        # Reference removes batch edges only when the batch is a strict
        # subset of the training edges (STAR-GCN.py:594).
        self.do_remove = self.s.remove_rating and self.train_batch < n_train
        # Pad batches to a multiple of the data-parallel axis.
        dp = 1 if mesh is None else mesh.shape["data"]
        self.train_batch_padded = -(-self.train_batch // dp) * dp

        # Host-side pair->edge lookup tables (the in-jit searchsorted
        # chain is sequential and slow on TPU; numpy does it off the
        # critical path while the device runs the previous step).
        keys = (all_csr.row_indices.astype(np.int64) * all_csr.shape[1]
                + all_csr.end_points)
        ratings = np.searchsorted(
            all_csr.multi_link, all_csr.values).astype(np.int32)
        order = np.argsort(keys, kind="stable")
        self._lookup_keys_np = keys[order]
        self._lookup_rating_np = ratings[order]
        # Dense direct-index map when the pair space is small enough
        # (ML-100k: 1.6 MB, ML-10M: 746 MB): the per-step searchsorted
        # over B=10k queries costs ~1.7 ms of host time — the largest
        # single overhead of the ML-100k step — while a fancy-indexed
        # gather is ~50 us.  Value = rating index + 1, 0 = no edge.
        self._lookup_dense_np = None
        pair_space = int(all_csr.shape[0]) * int(all_csr.shape[1])
        if 0 < pair_space <= 1_000_000_000 and len(all_csr.multi_link) < 127:
            dense = np.zeros(pair_space, np.int8)
            dense[keys] = (ratings + 1).astype(np.int8)
            self._lookup_dense_np = dense

        self._rng_key = jax.random.PRNGKey(self.s.seed)
        self.params = self._init_params()
        self.opt = self._make_optimizer()
        if self.shardings is not None:
            self.params = self.shardings.place_params(self.params)
        self.opt_state = self.opt.init(self.params)
        self.lr = self.s.lr

        self._features_cache = None
        self._train_step = jax.jit(partial(_train_step, self),
                                   donate_argnums=(0, 1))
        self._eval_step = jax.jit(partial(_eval_step, self))
        self._scan_step = None
        self._scan_k = 0
        self._dev_scan_step = None
        self._dev_scan_k = 0
        self._dev_train_arrays = None
        pm = data_iter.embed_P_mask
        pz = data_iter._embed_p_zero
        self._dev_pmask = (float(pm.get("user", 0.0)),
                           float(pm.get("movie", pm.get("item", 0.0))))
        self._dev_pzero = (float(pz.get("user", 0.0)),
                           float(pz.get("movie", pz.get("item", 0.0))))

    # ------------------------------ setup -----------------------------------

    def _build_variant_masks(self, all_csr):
        """Float edge masks (over padded edge arrays) for each graph
        variant, mirroring ``iterators.py:165-176``."""
        it = self.data_iter
        E_pad = self.graph_data.num_edges_padded
        masks = {}
        for name, variant in (("test", it.test_graph),
                              ("valid", it.val_graph),
                              ("train", it.train_graph)):
            pairs = variant["user", "movie"].node_pair_ids
            idx = all_csr.edge_indices_by_id(pairs)
            assert np.all(idx >= 0)
            m = np.zeros(E_pad, np.float32)
            m[idx] = 1.0
            masks[name] = jnp.asarray(m)
        return masks

    def _init_params(self):
        self._rng_key, init_key, drop_key = jax.random.split(self._rng_key, 3)
        B = self.train_batch_padded
        # Init on a TINY same-dims dummy graph: parameter shapes depend
        # only on the node/link counts, and tracing the full graph here
        # would materialise the un-chunked (E, units) message buffer
        # (10 GB at ML-10M) just to create parameters.
        cfg = self.model_cfg
        rng = np.random.RandomState(0)
        n = 256
        tiny = BipartiteGraphData.from_arrays(
            rng.randint(0, cfg.num_users, n),
            rng.randint(0, cfg.num_items, n),
            rng.randint(0, cfg.num_links, n),
            cfg.num_users, cfg.num_items, cfg.num_links, pad_multiple=256)
        dummy = dict(
            graph=tiny,
            edge_mask=tiny.edge_pad_mask,
            noise_user=jnp.zeros(self.model_cfg.num_users, jnp.int32),
            noise_item=jnp.zeros(self.model_cfg.num_items, jnp.int32),
            pairs_user=jnp.zeros(B, jnp.int32),
            pairs_item=jnp.zeros(B, jnp.int32),
        )
        if self.model_cfg.use_fea_proj:
            dummy["user_features"] = jnp.asarray(
                self.data_iter.all_graph.features["user"])
            dummy["item_features"] = jnp.asarray(
                self.data_iter.all_graph.features["movie"])
        # jit the init: XLA schedules/reuses the trace's intermediate
        # buffers (eager init materialises each (R, N, units) temp).
        init_fn = jax.jit(partial(self.model.init, train=False))
        variables = init_fn(
            {"params": init_key, "dropout": drop_key}, **dummy)
        return variables["params"]

    def _make_optimizer(self):
        return make_optimizer(self.s)

    def set_lr(self, lr: float):
        self.lr = lr
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)

    # --------------------------- public driving ------------------------------

    def features(self):
        if not self.model_cfg.use_fea_proj:
            return None, None
        if self._features_cache is None:
            # one host->HBM transfer per type, reused across steps —
            # HeterGraph.device_features is the reference's
            # gen_nd_features(ctx) analogue (graph.py:1032-1043)
            dev = self.data_iter.all_graph.device_features()
            self._features_cache = (dev["user"], dev["movie"])
        return self._features_cache

    def host_edge_lookup(self, pu, pi, valid):
        """(hit, rating) for batch pairs — numpy, off the device path."""
        q = pu.astype(np.int64) * self.model_cfg.num_items + pi
        if self._lookup_dense_np is not None:
            v = self._lookup_dense_np[q].astype(np.int32)
            hit = ((v > 0) & (valid > 0)).astype(np.float32)
            return hit, np.maximum(v - 1, 0)
        pos = np.searchsorted(self._lookup_keys_np, q)
        pos = np.clip(pos, 0, max(self._lookup_keys_np.size - 1, 0))
        hit = ((self._lookup_keys_np[pos] == q) & (valid > 0)).astype(
            np.float32)
        rating = self._lookup_rating_np[pos]
        return hit, rating

    def _prep_host_arrays(self, rating_batch, recon_batch):
        """Bundle one step's inputs into 4 host arrays (relay transfer
        latency is per-array)."""
        (pairs, gt_ratings) = rating_batch
        noise_u, noise_i, recon_mask_u, recon_mask_i = recon_batch
        B = self.train_batch_padded
        n = gt_ratings.size
        ints = np.zeros((3, B), np.int32)
        flts = np.zeros((3, B), np.float32)
        ints[0, :n], ints[1, :n] = pairs[0], pairs[1]
        flts[0, :n], flts[1, :n] = gt_ratings, 1.0
        hit, rating = self.host_edge_lookup(ints[0], ints[1], flts[1])
        ints[2], flts[2] = rating, hit
        noise = np.concatenate([noise_u, noise_i]).astype(np.int32)
        rmask = np.concatenate([recon_mask_u, recon_mask_i]).astype(
            np.float32)
        return ints, flts, noise, rmask

    def _place_step_inputs(self, ints, flts, noise, rmask):
        if self.shardings is None:
            return (jnp.asarray(ints), jnp.asarray(flts),
                    jnp.asarray(noise), jnp.asarray(rmask))
        from jax.sharding import NamedSharding, PartitionSpec as P

        from stargcn_tpu.parallel.shardings import place

        # batch axis is the LAST axis in both layouts ([3,B] / [k,3,B])
        spec = [None] * (ints.ndim - 1) + ["data"]
        bshard = NamedSharding(self.mesh, P(*spec))
        return (place(ints, bshard), place(flts, bshard),
                *self.shardings.place_replicated(noise, rmask))

    def _train_dense_adj(self):
        return (self.dense_adj["train"]
                if self.dense_adj is not None else None)

    def _train_variant_degrees(self):
        return (self.variant_degrees["train"]
                if self.variant_degrees is not None else None)

    def _ell_pack(self, variant):
        if self.ell_packs is None:
            return None
        return self.ell_packs.get(variant, self.edge_masks[variant])

    def train_iteration(self, rating_batch, recon_batch):
        """One optimisation step.  Returns device-side stats dict."""
        self._rng_key, step_key = jax.random.split(self._rng_key)
        host = self._prep_host_arrays(rating_batch, recon_batch)
        ints_d, flts_d, noise_d, rmask_d = self._place_step_inputs(*host)
        self.params, self.opt_state, stats = self._train_step(
            self.params, self.opt_state, self.graph_data,
            self.edge_masks["train"], self._train_dense_adj(),
            self._train_variant_degrees(), self._ell_pack("train"),
            ints_d, flts_d, noise_d, rmask_d, step_key)
        return stats

    def train_chunk(self, rating_batches, recon_batches):
        """k fused optimisation steps in ONE device dispatch (lax.scan).

        Amortises the per-dispatch overhead of the runtime; numerically
        identical to k ``train_iteration`` calls.  Returns stats stacked
        along a leading k axis.
        """
        k = len(rating_batches)
        # Same key sequence as k single steps: results are bit-identical
        # regardless of scan_steps.
        keys = []
        for _ in range(k):
            self._rng_key, sk = jax.random.split(self._rng_key)
            keys.append(sk)
        keys = jnp.stack(keys)
        preps = [self._prep_host_arrays(rb, cb)
                 for rb, cb in zip(rating_batches, recon_batches)]
        stacked = [np.stack([p[j] for p in preps]) for j in range(4)]
        ints_d, flts_d, noise_d, rmask_d = self._place_step_inputs(*stacked)
        if self._scan_step is None or self._scan_k != k:
            self._scan_k = k
            self._scan_step = jax.jit(partial(_scan_train_steps, self),
                                      donate_argnums=(0, 1))
        self.params, self.opt_state, stats = self._scan_step(
            self.params, self.opt_state, self.graph_data,
            self.edge_masks["train"], self._train_dense_adj(),
            self._train_variant_degrees(), self._ell_pack("train"),
            ints_d, flts_d, noise_d, rmask_d, keys)
        return stats

    def train_chunk_dev(self, k):
        """k fused steps with ON-DEVICE batch sampling
        (TRAIN.DEVICE_SAMPLER): the dispatch carries only k RNG keys —
        no per-step host arrays at all.  On a mesh, the sampling math
        replicates (same key everywhere) and the drawn batch is handed
        to GSPMD with the same DP sharding as the host-fed layout.
        """
        if self._dev_train_arrays is None:
            it = self.data_iter
            tp = jnp.asarray(np.asarray(it.train_node_pairs, np.int32))
            tr = jnp.asarray(np.asarray(it.train_ratings, np.float32))
            tri = jnp.asarray(np.searchsorted(
                np.asarray(it.possible_rating_values),
                np.asarray(it.train_ratings)).astype(np.int32))
            if self.shardings is not None:
                # Replicated train-edge arrays; the sampled batch gets a
                # DP sharding constraint inside the step.
                tp, tr, tri = self.shardings.place_replicated(tp, tr, tri)
            self._dev_train_arrays = (tp, tr, tri)
        keys = []
        for _ in range(k):
            self._rng_key, sk = jax.random.split(self._rng_key)
            keys.append(sk)
        keys = jnp.stack(keys)
        if self._dev_scan_step is None or self._dev_scan_k != k:
            self._dev_scan_k = k
            self._dev_scan_step = jax.jit(
                partial(_scan_train_steps_dev, self),
                donate_argnums=(0, 1))
        tp, tr, tri = self._dev_train_arrays
        self.params, self.opt_state, stats = self._dev_scan_step(
            self.params, self.opt_state, self.graph_data,
            self.edge_masks["train"], self._train_dense_adj(),
            self._train_variant_degrees(), self._ell_pack("train"),
            tp, tr, tri, keys)
        return stats

    def prepare_recon_batch(self, embed_noise_dict, recon_ids_dict):
        """Noise arrays + float recon masks from the sampler output."""
        nu = embed_noise_dict["user"]
        ni = embed_noise_dict["movie"]
        mu = np.zeros(self.model_cfg.num_users, np.float32)
        mi = np.zeros(self.model_cfg.num_items, np.float32)
        if "user" in recon_ids_dict:
            mu[recon_ids_dict["user"]] = 1.0
        if "movie" in recon_ids_dict:
            mi[recon_ids_dict["movie"]] = 1.0
        return nu, ni, mu, mi

    def evaluate(self, segment: str = "valid"):
        """Per-block RMSE on the given segment (``STAR-GCN.py:465-498``):
        predictions are denormalised and clipped to the rating range."""
        it = self.data_iter
        dp = 1 if self.mesh is None else self.mesh.shape["data"]
        B = min(self.s.rating_batch_size,
                max(1, it.valid_node_pairs.shape[1]
                    if segment == "valid" else
                    it.test_node_pairs.shape[1]))
        B = -(-B // dp) * dp
        noise_u = jnp.asarray(it.evaluate_embed_noise_dict["user"])
        noise_i = jnp.asarray(it.evaluate_embed_noise_dict["movie"])
        if self.shardings is not None:
            noise_u, noise_i = self.shardings.place_replicated(
                noise_u, noise_i)
        mask = self.edge_masks["valid" if segment == "valid" else "test"]
        sq_sum = np.zeros(self.model_cfg.nblocks)
        cnt = 0
        for pairs, ratings in it.rating_sampler(batch_size=B,
                                                segment=segment,
                                                sequential=True):
            n = ratings.size
            pu = np.zeros(B, np.int32)
            pi = np.zeros(B, np.int32)
            gt = np.zeros(B, np.float32)
            valid = np.zeros(B, np.float32)
            pu[:n], pi[:n], gt[:n], valid[:n] = (
                pairs[0], pairs[1], ratings, 1.0)
            if self.shardings is not None:
                pu, pi, gt, valid = self.shardings.place_batch(
                    pu, pi, gt, valid)
            seg_key = "valid" if segment == "valid" else "test"
            dense_adj = (self.dense_adj[seg_key]
                         if self.dense_adj is not None else None)
            variant_degrees = (self.variant_degrees[seg_key]
                               if self.variant_degrees is not None else None)
            block_sq = self._eval_step(
                self.params, self.graph_data, jnp.asarray(pu),
                jnp.asarray(pi), jnp.asarray(gt), jnp.asarray(valid),
                mask, dense_adj, variant_degrees, self._ell_pack(seg_key),
                noise_u, noise_i)
            sq_sum += np.asarray(block_sq)
            cnt += n
        return np.sqrt(sq_sum / max(cnt, 1))

    def predict(self, pairs_user, pairs_item, segment: str = "test"):
        """Denormalised, range-clipped rating predictions (last block)
        for arbitrary (user, item) pairs — the serving entry point.

        Uses the given graph variant's adjacency and the eval noise
        masking (cold-start nodes -> zero embedding, as in evaluation).
        """
        it = self.data_iter
        pairs_user = np.asarray(pairs_user, np.int32)
        pairs_item = np.asarray(pairs_item, np.int32)
        n = pairs_user.size
        dp = 1 if self.mesh is None else self.mesh.shape["data"]
        B = min(self.s.rating_batch_size, max(1, n))
        B = -(-B // dp) * dp
        noise_u = jnp.asarray(it.evaluate_embed_noise_dict["user"])
        noise_i = jnp.asarray(it.evaluate_embed_noise_dict["movie"])
        if self.shardings is not None:
            noise_u, noise_i = self.shardings.place_replicated(
                noise_u, noise_i)
        seg_key = "valid" if segment == "valid" else "test"
        mask = self.edge_masks[seg_key]
        dense_adj = (self.dense_adj[seg_key]
                     if self.dense_adj is not None else None)
        variant_degrees = (self.variant_degrees[seg_key]
                           if self.variant_degrees is not None else None)
        out = np.zeros(n, np.float32)
        for start in range(0, n, B):
            end = min(start + B, n)
            pu = np.zeros(B, np.int32)
            pi = np.zeros(B, np.int32)
            pu[:end - start] = pairs_user[start:end]
            pi[:end - start] = pairs_item[start:end]
            if self.shardings is not None:
                pu, pi = self.shardings.place_batch(pu, pi)
            preds = self._predict_step(
                self.params, self.graph_data, jnp.asarray(pu),
                jnp.asarray(pi), mask, dense_adj, variant_degrees,
                self._ell_pack(seg_key), noise_u, noise_i)
            out[start:end] = np.asarray(preds)[:end - start]
        return out

    @property
    def _predict_step(self):
        if not hasattr(self, "_predict_step_fn"):
            def step(params, g, pu, pi, mask, dense_adj, variant_degrees,
                     ell_pack, noise_u, noise_i):
                fu, fi = self.features()
                out = self.model.apply(
                    {"params": params}, g, mask, noise_u,
                    noise_i, pu, pi, user_features=fu, item_features=fi,
                    dense_adj=dense_adj, variant_degrees=variant_degrees,
                    ell_pack=ell_pack, train=False)
                denorm = (out["pred_ratings"][-1] * self.rating_std
                          + self.rating_mean)
                return jnp.clip(denorm, self.rating_min, self.rating_max)

            self._predict_step_fn = jax.jit(step)
        return self._predict_step_fn

    # ------------------------------- fit ------------------------------------

    def fit(self, max_iter: Optional[int] = None, log=logging.info):
        """The full training schedule (``STAR-GCN.py:507-713``)."""
        s = self.s
        it = self.data_iter
        max_iter = max_iter or s.max_iter
        rating_sampler = it.rating_sampler(batch_size=s.rating_batch_size,
                                           segment="train")
        recon_sampler = (it.recon_nodes_sampler(
            batch_size=s.recon_batch_size) if s.use_dae else None)

        if self.save_dir is not None:
            # net%d.txt architecture dump (reference gluon_net_info,
            # STAR-GCN.py:636 / mxgraph/utils.py:88-101).
            from stargcn_tpu.utils.model_info import model_info
            model_info(self.params, os.path.join(
                self.save_dir, f"net{self.save_id}.txt"))
        loggers = self._make_metric_loggers()
        # Failure detection / elastic recovery (train/resilience.py):
        # silent-stall diagnosis + bounded restart of failed dispatches.
        from stargcn_tpu.train.resilience import (ElasticPolicy,
                                                  ElasticStep,
                                                  HeartbeatMonitor)
        monitor = None
        if s.hang_timeout_s and s.hang_timeout_s > 0:
            crash_file = (os.path.join(self.save_dir,
                                       f"crash_{self.save_id}.log")
                          if self.save_dir else None)
            monitor = HeartbeatMonitor(s.hang_timeout_s, log=log,
                                       crash_file=crash_file).start()
        elastic = ElasticStep(ElasticPolicy(max_restarts=s.max_restarts),
                              on_restore=self._elastic_restore, log=log)
        nan_recoveries = 0
        best_valid_rmse = np.inf
        best_test_rmse = None
        best_iter = -1
        no_better = 0
        nb = self.model_cfg.nblocks
        t_start = time.time()
        stop = False
        # Steps per device dispatch: fuse via lax.scan when the cadence
        # allows (numerically identical; amortises dispatch overhead).
        k = s.scan_steps if (s.scan_steps > 1
                             and s.log_interval % s.scan_steps == 0
                             and s.valid_interval % s.scan_steps == 0
                             and max_iter >= s.scan_steps) else 1

        def next_batches():
            rb = next(rating_sampler)
            if s.use_dae:
                noise_dict, _, all_recon_ids = next(recon_sampler)
                cb = self.prepare_recon_batch(noise_dict, all_recon_ids)
            else:
                ident_u = np.arange(self.model_cfg.num_users,
                                    dtype=np.int32)
                ident_i = np.arange(self.model_cfg.num_items,
                                    dtype=np.int32)
                cb = (ident_u, ident_i,
                      np.zeros(self.model_cfg.num_users, np.float32),
                      np.zeros(self.model_cfg.num_items, np.float32))
            return rb, cb

        # On-device sampling path: the dispatch carries only RNG keys.
        use_dev = s.device_sampler and self.shardings is None
        # One-chunk-ahead prefetch: host batch sampling/prep runs in a
        # background thread while the device executes the current chunk.
        prefetcher = None
        if k > 1 and not use_dev:
            import queue
            import threading

            q = queue.Queue(maxsize=2)
            stop_evt = threading.Event()

            def producer():
                while not stop_evt.is_set():
                    chunk = [next_batches() for _ in range(k)]
                    while not stop_evt.is_set():
                        try:
                            q.put(chunk, timeout=0.1)
                            break
                        except queue.Full:
                            continue

            prefetcher = threading.Thread(target=producer, daemon=True)
            prefetcher.start()

            def next_chunk():
                return q.get()
        stop_prefetch = (stop_evt.set if prefetcher is not None
                         else (lambda: None))

        # Stats stay on device between log intervals: one host sync per
        # interval instead of per step (the reference pays a device->host
        # round trip every iteration, ``STAR-GCN.py:641-660``).
        pending = []
        pending_cnt = 0
        iter_idx = 0
        # With chunking, max_iter rounds down to a multiple of k (the
        # prefetch thread owns the samplers; no single-step tail).
        effective_max = (max_iter // k) * k if k > 1 else max_iter
        while iter_idx < effective_max:
            if use_dev:
                stats = elastic.run(self.train_chunk_dev, k)
                pending.append(stats)
                pending_cnt += self.train_batch_padded * k
                iter_idx += k
            elif k > 1:
                pulls = next_chunk()
                stats = elastic.run(self.train_chunk,
                                    [p[0] for p in pulls],
                                    [p[1] for p in pulls])
                # stacked stats: split back into per-step trees lazily
                pending.append(stats)
                pending_cnt += sum(p[0][1].size for p in pulls)
                iter_idx += k
            else:
                rb, cb = next_batches()
                stats = elastic.run(self.train_iteration, rb, cb)
                pending.append(stats)
                pending_cnt += rb[1].size
                iter_idx += 1
            if monitor is not None:
                monitor.beat()
            if len(pending) > 16:
                # Bound in-flight dispatches: every queued step pins its
                # feed buffers in HBM until it executes, so an unbounded
                # async queue OOMs at large scales (observed at 500k-node
                # graphs).  Waiting on the OLDEST keeps the pipeline full.
                jax.block_until_ready(pending[-16]["loss"])

            logging_str = ""
            if iter_idx % s.log_interval == 0:
                fetched = jax.device_get(pending)

                def acc(name):
                    # leaves are [...] (single step) or [k, ...] (chunk;
                    # chunked trees have a non-scalar 'loss')
                    total, count = 0.0, 0
                    for f in fetched:
                        leaf = np.asarray(f[name])
                        if np.asarray(f["loss"]).ndim > 0:
                            total = total + leaf.sum(axis=0)
                            count += leaf.shape[0]
                        else:
                            total = total + leaf
                            count += 1
                    return total, count

                gnorm_sum, n_steps_acc = acc("gnorm")
                sq_sum, _ = acc("sq_err")
                rl_sum, _ = acc("rating_loss")
                cl_sum, _ = acc("recon_loss")
                last_loss = np.asarray(fetched[-1]["loss"]).reshape(-1)[-1]
                stats = {"loss": last_loss}
                avg = {
                    "gnorm": gnorm_sum,
                    "sq": sq_sum,
                    "cnt": pending_cnt,
                    "rating_loss": rl_sum,
                    "recon_loss": cl_sum,
                    "batches": n_steps_acc,
                }
                pending, pending_cnt = [], 0
                if not np.isfinite(float(stats["loss"])):
                    # NaN watchdog (framework addition): restore the best
                    # checkpoint if any, halve the LR, keep going —
                    # bounded: repeated divergence means the config is
                    # broken, not the run.
                    nan_recoveries += 1
                    if nan_recoveries > s.max_nan_recoveries:
                        log(f"Non-finite loss at iter {iter_idx}; "
                            f"{nan_recoveries - 1} recoveries already "
                            "spent — stopping.")
                        stop = True
                        break
                    log(f"Non-finite loss at iter {iter_idx}; "
                        "restoring best checkpoint and halving LR "
                        f"(recovery {nan_recoveries}/"
                        f"{s.max_nan_recoveries}).")
                    ckpt = (os.path.join(
                        self.save_dir, f"ckpt_best_{self.save_id}.msgpack")
                        if self.save_dir else None)
                    if ckpt and os.path.exists(ckpt):
                        self.restore_checkpoint(ckpt)
                    self.set_lr(max(self.lr * 0.5, s.min_lr))
                    continue
                rmse = np.sqrt(avg["sq"] / max(avg["cnt"], 1))
                row = {"iter": iter_idx, "loss": float(stats["loss"])}
                for i in range(nb):
                    row[f"rmse{i}"] = rmse[i]
                    row[f"rating_loss{i}"] = \
                        avg["rating_loss"][i] / avg["batches"]
                    row[f"recon_loss{i}"] = \
                        avg["recon_loss"][i] / avg["batches"]
                loggers["train"].log(**row)
                dt = time.time() - t_start
                edges_per_step = (nb * len(self.model_cfg.agg_units) * 2
                                  * int(self.graph_data.num_edges_padded))
                logging_str = (
                    f"Iter={iter_idx}, gnorm={avg['gnorm']/avg['batches']:.3f}, "
                    f"loss={float(stats['loss']):.3f}, "
                    + ", ".join(f"RMSE{i}={rmse[i]:.3f}" for i in range(nb))
                    + f", {avg['cnt']/dt:.0f} pairs/s"
                    + f", {avg['batches']*edges_per_step/dt/1e6:.1f} M edges/s")
                t_start = time.time()

            if iter_idx % s.valid_interval == 0:
                valid_rmse = self.evaluate("valid")
                loggers["valid"].log(**{"iter": iter_idx, **{
                    f"rmse{i}": valid_rmse[i] for i in range(nb)}})
                logging_str += ", " + ", ".join(
                    f"Val RMSE{i}={valid_rmse[i]:.3f}" for i in range(nb))
                if valid_rmse[-1] < best_valid_rmse:
                    best_valid_rmse = valid_rmse[-1]
                    no_better = 0
                    best_iter = iter_idx
                    best_test_rmse = self.evaluate("test")
                    loggers["test"].log(**{"iter": iter_idx, **{
                        f"rmse{i}": best_test_rmse[i] for i in range(nb)}})
                    logging_str += ", " + ", ".join(
                        f"Test RMSE{i}={best_test_rmse[i]:.4f}"
                        for i in range(nb))
                    self.save_checkpoint("best")
                    # Periodic crash-safe resume point alongside best
                    # (elastic restore + CLI --resume both read it).
                    self.save_checkpoint("last")
                else:
                    no_better += 1
                    if (no_better > s.early_stopping_patience
                            and self.lr <= s.min_lr):
                        log("Early stopping threshold reached.")
                        stop = True
                    elif no_better > s.decay_patience:
                        new_lr = max(self.lr * s.lr_decay_factor, s.min_lr)
                        if new_lr < self.lr:
                            log(f"\tChange the LR to {new_lr:g}")
                            self.set_lr(new_lr)
                            no_better = 0
            if logging_str:
                log(logging_str)
            if stop:
                break
        stop_prefetch()
        if monitor is not None:
            monitor.stop()
        for lg in loggers.values():
            lg.close()
        # Crash-safe resume point (the reference has no checkpointing;
        # model saving is commented out at STAR-GCN.py:685).
        self.save_checkpoint("last")
        log(f"Best Iter={best_iter}, Best Valid RMSE={best_valid_rmse:.4f}, "
            + (", ".join(f"Best Test RMSE{i}={best_test_rmse[i]:.4f}"
                         for i in range(nb))
               if best_test_rmse is not None else "no test eval"))
        return {"best_iter": best_iter,
                "best_valid_rmse": float(best_valid_rmse),
                "best_test_rmse": (None if best_test_rmse is None
                                   else [float(x) for x in best_test_rmse])}

    def _make_metric_loggers(self):
        return make_metric_loggers(self.save_dir, self.save_id,
                                   self.model_cfg.nblocks)

    # ---------------------------- checkpointing ------------------------------

    def _elastic_restore(self):
        """Reload the most recent on-disk state after a failed dispatch
        (train/resilience.py ElasticStep).  Prefers the crash-safe
        'last' checkpoint, falls back to 'best'; without a save_dir the
        in-memory params simply continue (a transient dispatch failure
        loses no state — params update only on success)."""
        if self.save_dir is None:
            return
        for tag in ("last", "best"):
            path = os.path.join(self.save_dir,
                                f"ckpt_{tag}_{self.save_id}.msgpack")
            if os.path.exists(path):
                self.restore_checkpoint(path)
                return

    def save_checkpoint(self, tag: str = "last"):
        """Persist params + opt state (the reference leaves model saving
        commented out, ``STAR-GCN.py:685``; real checkpointing is a
        framework addition)."""
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


def _scan_train_steps(trainer, params, opt_state, g, edge_mask, dense_adj,
                      variant_degrees, ell_pack, ints, flts, noise, rmask,
                      keys):
    """k fused steps: lax.scan over the single-step body.  The graph
    arrays ride as loop-invariant traced arguments (NOT closure
    constants — embedded constants would bloat the serialized program
    beyond compile-service limits on big graphs)."""

    def body(carry, x):
        p, o = carry
        i, f, n, r, key = x
        p, o, stats = _train_step(trainer, p, o, g, edge_mask, dense_adj,
                                  variant_degrees, ell_pack, i, f, n, r,
                                  key)
        return (p, o), stats

    (params, opt_state), stats = jax.lax.scan(
        body, (params, opt_state), (ints, flts, noise, rmask, keys))
    return params, opt_state, stats


def _device_sample_step_inputs(trainer, tp, tr, tri, key):
    """One step's (ints, flts, noise, rmask, dropout_key) sampled ON
    DEVICE (TRAIN.DEVICE_SAMPLER) — the chunk dispatch carries only RNG
    keys, eliminating per-step host->device transfers (~250 KB/step at
    batch 10k, which dominates the small-graph step through this
    environment's TPU relay).

    Distributional deltas vs the host samplers (both documented,
    first-moment identical): batch indices are drawn WITH replacement
    (vs epoch-shuffled without-replacement slices), and recon-mask
    selection is per-node Bernoulli(P_mask) (vs an exact-count draw).
    Batch pairs are by construction train edges, so the REMOVE_RATING
    lookup is free: hit = 1, rating = the drawn edge's rating index.
    """
    cfg = trainer.model_cfg
    B = trainer.train_batch_padded
    n_train = tp.shape[1]
    k_idx, k_mu, k_zu, k_mi, k_zi, k_drop = jax.random.split(key, 6)
    idx = jax.random.randint(k_idx, (B,), 0, n_train)
    pu = jnp.take(tp[0], idx)
    pi = jnp.take(tp[1], idx)
    gt = jnp.take(tr, idx)
    rem_rating = jnp.take(tri, idx)
    ones = jnp.ones(B, jnp.float32)
    hit = ones if trainer.do_remove else jnp.zeros(B, jnp.float32)
    ints = jnp.stack([pu, pi, rem_rating])
    flts = jnp.stack([gt, ones, hit])

    def one_type(km, kz, n, pm, pz):
        iota = jnp.arange(n, dtype=jnp.int32)
        if not trainer.s.use_dae:
            return iota, jnp.zeros(n, jnp.float32)
        sel = jax.random.bernoulli(km, pm, (n,))
        zero = jax.random.bernoulli(kz, pz, (n,))
        noise = jnp.where(sel & zero, -1, iota).astype(jnp.int32)
        return noise, sel.astype(jnp.float32)

    nu, mu = one_type(k_mu, k_zu, cfg.num_users,
                      trainer._dev_pmask[0], trainer._dev_pzero[0])
    ni, mi = one_type(k_mi, k_zi, cfg.num_items,
                      trainer._dev_pmask[1], trainer._dev_pzero[1])
    if trainer.shardings is not None:
        # Sharded steady state: the sampling math is replicated (same
        # key on every device -> identical draw), and this constraint
        # hands the batch to GSPMD DP-sharded exactly like the host-fed
        # layout (_place_step_inputs: batch axis last over 'data').
        from jax.sharding import NamedSharding, PartitionSpec as P

        cons = NamedSharding(trainer.mesh, P(None, "data"))
        ints = jax.lax.with_sharding_constraint(ints, cons)
        flts = jax.lax.with_sharding_constraint(flts, cons)
    return (ints, flts, jnp.concatenate([nu, ni]),
            jnp.concatenate([mu, mi]), k_drop)


def _scan_train_steps_dev(trainer, params, opt_state, g, edge_mask,
                          dense_adj, variant_degrees, ell_pack, tp, tr,
                          tri, keys):
    """k fused steps with on-device batch sampling (see
    ``_device_sample_step_inputs``)."""

    def body(carry, key):
        p, o = carry
        ints, flts, noise, rmask, k_drop = _device_sample_step_inputs(
            trainer, tp, tr, tri, key)
        p, o, stats = _train_step(trainer, p, o, g, edge_mask, dense_adj,
                                  variant_degrees, ell_pack, ints, flts,
                                  noise, rmask, k_drop)
        return (p, o), stats

    (params, opt_state), stats = jax.lax.scan(
        body, (params, opt_state), keys)
    return params, opt_state, stats


def _train_step(trainer, params, opt_state, g, edge_mask, dense_adj,
                variant_degrees, ell_pack, ints, flts, noise, rmask, rng):
    cfg = trainer.model_cfg
    s = trainer.s
    mean, std = trainer.rating_mean, trainer.rating_std
    fu, fi = trainer.features()

    pairs_u, pairs_i, rem_rating = ints[0], ints[1], ints[2]
    gt_ratings, pairs_valid, rem_hit = flts[0], flts[1], flts[2]
    noise_u = noise[:cfg.num_users]
    noise_i = noise[cfg.num_users:]
    recon_mask_u = rmask[:cfg.num_users]
    recon_mask_i = rmask[cfg.num_users:]

    removed_pairs = None
    if trainer.do_remove:
        removed_pairs = (pairs_u, pairs_i, rem_hit, rem_rating)
        if dense_adj is None:
            # XLA path: removal via the per-edge mask.
            edge_mask = g.edge_mask_from_pairs(pairs_u, pairs_i,
                                               rem_hit, edge_mask)
    n_valid = jnp.maximum(pairs_valid.sum(), 1.0)

    def loss_fn(p):
        out = trainer.model.apply(
            {"params": p}, g, edge_mask, noise_u, noise_i,
            pairs_u, pairs_i, user_features=fu, item_features=fi,
            dense_adj=dense_adj, removed_pairs=removed_pairs,
            variant_degrees=variant_degrees, ell_pack=ell_pack,
            train=True, rngs={"dropout": rng})
        target = (gt_ratings - mean) / std
        # gluon L2Loss = mean(0.5 * (pred - label)^2)  (STAR-GCN.py:614);
        # padded batch slots carry zero weight.
        sq = (out["pred_ratings"] - target[None, :]) ** 2
        rating_loss = 0.5 * jnp.sum(sq * pairs_valid[None, :],
                                    axis=1) / n_valid
        loss = rating_loss.sum()
        recon_loss = jnp.zeros(cfg.nblocks)
        if s.use_dae:
            rls = []
            for blk in out["pred_embed"]:
                block_loss = 0.0
                for key, m in (("user", recon_mask_u),
                               ("item", recon_mask_i)):
                    sq = jnp.sum((blk[key] - out["gt_embed"][key]) ** 2,
                                 axis=-1)
                    block_loss += jnp.sum(sq * m) / jnp.maximum(m.sum(), 1.0)
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


def _eval_step(trainer, params, g, pairs_u, pairs_i, gt_ratings, valid,
               edge_mask, dense_adj, variant_degrees, ell_pack, noise_u,
               noise_i):
    fu, fi = trainer.features()
    out = trainer.model.apply(
        {"params": params}, g, edge_mask, noise_u, noise_i,
        pairs_u, pairs_i, user_features=fu, item_features=fi,
        dense_adj=dense_adj, variant_degrees=variant_degrees,
        ell_pack=ell_pack, train=False)
    denorm = out["pred_ratings"] * trainer.rating_std + trainer.rating_mean
    clipped = jnp.clip(denorm, trainer.rating_min, trainer.rating_max)
    sq = (clipped - gt_ratings[None, :]) ** 2
    return jnp.sum(sq * valid[None, :], axis=1)

"""Mini-batch training loop for the sampled two-phase mode.

The beyond-HBM counterpart of ``Trainer.fit``: host plan building runs in
a background prefetch thread (it dominates wall time at large scale —
BASELINE.md), the device step is the jitted ``make_sampled_train_step``,
and with ``frontier_caps`` every batch reuses one compiled program.
Evaluation uses exact (fanout = -1) capped plans per eval batch.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stargcn_tpu.graph.sampling import BlockSampler
from stargcn_tpu.models.sampled import (
    StackedPlan,
    make_sampled_train_step,
    sampled_forward,
)


class SampledTrainer:
    """Sampled-mode training driver sharing the full-graph parameter
    pytree (checkpoints interchange with ``Trainer``)."""

    def __init__(self, model_cfg, graph, params, *, fanout, frontier_caps,
                 batch_size, rating_mean, rating_std, recon_lambda=0.1,
                 lr=2e-3, grad_clip=1.0, recon_per_batch=0,
                 name_user="user", name_item="movie", seed=0):
        self.cfg = model_cfg
        self.graph = graph
        self.params = params
        self.fanout = fanout
        self.caps = frontier_caps
        self.batch_size = batch_size
        self.recon_per_batch = recon_per_batch
        self.rating_mean = rating_mean
        self.rating_std = rating_std
        self.names = (name_user, name_item)
        self._rng = np.random.RandomState(seed)
        self._key = jax.random.PRNGKey(seed)
        self.opt = optax.chain(optax.clip_by_global_norm(grad_clip),
                               optax.adam(lr))
        self.opt_state = self.opt.init(params)
        self.step_fn = make_sampled_train_step(
            model_cfg, self.opt, rating_mean, rating_std, recon_lambda)
        self.sampler = BlockSampler(
            graph, num_layers=len(model_cfg.agg_units), fanout=fanout,
            symm=model_cfg.agg_norm_symm, frontier_caps=frontier_caps,
            name_user=name_user, name_item=name_item)
        csr = graph[name_user, name_item]
        self._pairs = csr.node_pair_ids
        self._values = csr.values
        self.noise_u = jnp.arange(model_cfg.num_users, dtype=jnp.int32)
        self.noise_i = jnp.arange(model_cfg.num_items, dtype=jnp.int32)

    def _make_batch(self):
        """Host-only batch construction (NO device transfers here: this
        runs in the prefetch thread, and device ops from a non-main
        thread serialize pathologically on some runtimes — convert with
        ``as_device()`` on the consumer side)."""
        n = self._pairs.shape[1]
        # with-replacement draw: O(B) instead of an O(E) permutation per
        # batch (duplicates are ~B/E rare at scale)
        sel = self._rng.randint(0, n, self.batch_size)
        bu, bi = self._pairs[0, sel], self._pairs[1, sel]
        gt = self._values[sel]
        r = self.recon_per_batch
        plan = StackedPlan.build(
            self.graph, self.cfg, bu, bi, fanout=self.fanout,
            frontier_caps=self.caps, sampler=self.sampler,
            recon_user_ids=bu[:r] if r else None,
            recon_item_ids=bi[:r] if r else None)
        return plan, gt

    def fit(self, num_steps: int, log=logging.info, log_interval: int = 10,
            prefetch: bool = True):
        """Train, optionally with one-plan-ahead background prefetching.

        The plan builder is many small numpy/Python ops that hold the
        GIL, so prefetching only pays when the device step is long
        relative to plan building; measure both on your graph.
        """
        stop = threading.Event()
        if prefetch:
            q: queue.Queue = queue.Queue(maxsize=2)

            def producer():
                while not stop.is_set():
                    item = self._make_batch()
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue

            thread = threading.Thread(target=producer, daemon=True)
            thread.start()
            next_batch = q.get
        else:
            next_batch = self._make_batch
        losses = []
        try:
            valid = jnp.ones(self.batch_size, jnp.float32)
            for it in range(1, num_steps + 1):
                plan, gt = next_batch()
                dplan = plan.as_device()
                self._key, sub = jax.random.split(self._key)
                self.params, self.opt_state, stats = self.step_fn(
                    self.params, self.opt_state, dplan, self.noise_u,
                    self.noise_i, jnp.asarray(gt), valid, sub)
                if it % log_interval == 0:
                    loss = float(stats["loss"])
                    losses.append(loss)
                    log(f"sampled iter={it} loss={loss:.4f}")
        finally:
            stop.set()
        return losses

    def evaluate_rmse(self, pairs, values, batch_size: Optional[int] = None):
        """Exact (all-neighbor) sampled evaluation: RMSE over denormalised,
        range-clipped last-block predictions."""
        batch_size = batch_size or self.batch_size
        lo = float(np.min(self._values))
        hi = float(np.max(self._values))
        sq, cnt = 0.0, 0
        for start in range(0, pairs.shape[1], batch_size):
            bu = pairs[0, start:start + batch_size]
            bi = pairs[1, start:start + batch_size]
            gt = values[start:start + batch_size]
            plan = StackedPlan.build(
                self.graph, self.cfg, bu, bi, fanout=-1,
                node_pad=128)
            out = sampled_forward(self.params, self.cfg, plan,
                                  np.asarray(self.noise_u),
                                  np.asarray(self.noise_i))
            pred = np.asarray(out["pred_ratings"][-1]) * self.rating_std \
                + self.rating_mean
            pred = np.clip(pred, lo, hi)
            sq += float(((pred - gt) ** 2).sum())
            cnt += gt.size
        return float(np.sqrt(sq / max(cnt, 1)))

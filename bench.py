#!/usr/bin/env python
"""Benchmark: STAR-GCN training-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: aggregated edge-messages/s through the multi-link graph
convolution during full training steps (forward + backward) on an
ML-100k-sized synthetic graph (943 users x 1682 items, 100k edges, 5
rating levels, the flagship 2-block STAR-GCN config).  Edge-messages per
step = nblocks x layers x directions x E (forward count; the backward
pass roughly doubles the work but is not double-counted).

The reference repo records no benchmark numbers (BASELINE.md): its CUDA
harness (seg_ops_cuda/seg_ops.cu) prints machine-local times only.
``vs_baseline`` is therefore reported against this framework's round-1
XLA-scatter measurement on the same chip (24.1e6 edge-msg/s for a single
aggregation layer forward), so improvements are tracked across rounds.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

# Persistent compilation cache — remote TPU compiles are minutes; cache
# makes driver re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, ".jax_cache"))

BASELINE_EDGES_PER_S = 24.1e6  # round-1 single-layer XLA forward, same chip


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import numpy as np

    from __graft_entry__ import _make_trainer

    trainer = _make_trainer(batch=10000)
    cfgm = trainer.model_cfg
    E = int(np.asarray(trainer.graph_data.edge_pad_mask).sum())
    edges_per_step = cfgm.nblocks * len(cfgm.agg_units) * 2 * E

    # k steps fused per dispatch (the production fit() path with
    # TRAIN.SCAN_STEPS; numerically identical to single steps).
    K = 10
    rating_sampler = trainer.data_iter.rating_sampler(
        trainer.train_batch, "train")
    recon_sampler = trainer.data_iter.recon_nodes_sampler(batch_size=10**6)

    def pull_chunk():
        rbs, cbs = [], []
        for _ in range(K):
            rbs.append(next(rating_sampler))
            noise, _, ids = next(recon_sampler)
            cbs.append(trainer.prepare_recon_batch(noise, ids))
        return rbs, cbs

    # compile + warmup (the runtime needs a few executions to reach
    # steady state)
    for _ in range(3):
        rbs, cbs = pull_chunk()
        stats = trainer.train_chunk(rbs, cbs)
    jax.block_until_ready(stats["loss"])

    # Median of 5 timing windows — the TPU runtime shows ~±10%
    # run-to-run variance.  Host batch prep pipelines with device
    # compute as in fit().
    windows = []
    for _ in range(5):
        n_chunks = 3
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            rbs, cbs = pull_chunk()
            stats = trainer.train_chunk(rbs, cbs)
        jax.block_until_ready(stats["loss"])
        windows.append((time.perf_counter() - t0) / (n_chunks * K))
    dt = sorted(windows)[len(windows) // 2]

    edges_per_s = edges_per_step / dt
    print(json.dumps({
        "metric": "train_step_edge_messages_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edge_msgs/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()

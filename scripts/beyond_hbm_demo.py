#!/usr/bin/env python
"""Beyond-HBM training demo: a graph too large for ANY full-graph
backend on one chip, trained end-to-end in sampled mini-batch mode.

Scale (default): 500k users x 50k items, 50M edges, 10 rating levels.
Full-graph is impossible here by arithmetic, not assertion —

* bitdense: (R, Nu, Ni) at 1 bit = 10 * 500e3 * 50e3 / 8 B = 31.25 GB
  per direction layout, ~2x v5e HBM (16 GB) before params/activations;
* chunked-ELL / dense: proportionally worse (bf16 dense would be 500 GB).

Sampled mode's per-step footprint is O(batch * fanout^L), independent
of graph size — this is the capability the two-phase plan/execute
machinery exists for (the TPU answer to the reference's
``gen_plan``/``heter_sage``, ``mxgraph/layers/layers.py:260-385``,
whose host-resident graph had the same role on GPU).

Prints one JSON line: steps/s, rating-pairs/s, first/last train loss,
valid RMSE, and the HBM arithmetic above.

    python scripts/beyond_hbm_demo.py [--edges 50000000] [--iters 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=500_000)
    p.add_argument("--items", type=int, default=50_000)
    p.add_argument("--edges", type=int, default=50_000_000)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--fanout", type=int, default=8)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    import jax

    from stargcn_tpu.data import DataIterator
    from stargcn_tpu.data.synthetic import synthetic_graph
    from stargcn_tpu.train import build_model_config
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer
    from stargcn_tpu.utils import cfg_from_file, default_cfg

    levels = 10
    bitdense_gb = levels * args.users * args.items / 8 / 1e9
    t0 = time.time()
    g = synthetic_graph(num_users=args.users, num_items=args.items,
                        num_edges=args.edges,
                        rating_values=tuple(np.arange(0.5, 5.01, 0.5)),
                        seed=7)
    csr = g["user", "movie"]
    build_s = time.time() - t0
    print(f"# graph built: {csr.nnz} edges in {build_s:.0f}s", flush=True)

    rng = np.random.RandomState(7)
    pairs = csr.node_pair_ids
    hold = rng.permutation(pairs.shape[1])[:200_000]
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, hold[:100_000]],
                      valid_node_pairs=pairs[:, hold[100_000:]],
                      embed_P_mask=0.1, embed_p_zero=0.0,
                      embed_p_self=1.0, seed=7)

    cfg = default_cfg()
    cfg_from_file(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs",
        "transductive_ml_10m.yml"), cfg)
    cfg.DATASET.NAME = "synthetic"
    cfg.TRAIN.RATING_BATCH_SIZE = args.batch
    cfg.TRAIN.RECON_BATCH_SIZE = 1024
    cfg.TRAIN.MAX_ITER = args.iters
    cfg.TRAIN.VALID_INTERVAL = max(args.iters // 2, 10)
    cfg.TRAIN.LOG_INTERVAL = 10
    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link), num_edges=csr.nnz)
    t0 = time.time()
    trainer = SampledTrainer(model_cfg, it, TrainSettings.from_cfg(cfg),
                             fanout=args.fanout)
    setup_s = time.time() - t0

    rs = it.rating_sampler(batch_size=trainer.train_batch, segment="train")
    recon = it.recon_nodes_sampler(batch_size=1024)
    losses = []
    batch = trainer._build_batch_safe(rs, recon)
    trainer.train_iteration(batch)  # compile
    t0 = time.time()
    pending = []
    for i in range(args.iters):
        stats = trainer.train_iteration(
            trainer._build_batch_safe(rs, recon))
        pending.append(stats["loss"])
        if (i + 1) % 10 == 0:
            # bound the dispatch queue: each queued step holds its feed
            # buffers (plan + full-size noise arrays) in HBM until it
            # executes — unbounded async dispatch OOMs at this scale
            losses.extend(float(x) for x in jax.device_get(pending))
            pending.clear()
    losses.extend(float(x) for x in jax.device_get(pending))
    train_s = time.time() - t0
    rmse = trainer.evaluate("valid")

    out = {
        "metric": "beyond_hbm_sampled_training",
        "graph": f"{args.users}x{args.items}, {csr.nnz} edges, "
                 f"{levels} levels",
        "bitdense_layout_gb": round(bitdense_gb, 1),
        "hbm_gb": 16,
        "full_graph_possible": bitdense_gb < 16,
        "steps_per_s": round(args.iters / train_s, 2),
        "ms_per_step": round(train_s / args.iters * 1e3, 1),
        "rating_pairs_per_s": round(args.iters * args.batch / train_s, 1),
        "loss_first10": round(float(np.mean(losses[:10])), 4),
        "loss_last10": round(float(np.mean(losses[-10:])), 4),
        "loss_decreased": bool(np.mean(losses[-10:]) < np.mean(losses[:10])),
        "valid_rmse": [round(float(x), 4) for x in np.asarray(rmse)],
        "graph_build_s": round(build_s, 1),
        "trainer_setup_s": round(setup_s, 1),
        "frontier_caps": dict(trainer.caps),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

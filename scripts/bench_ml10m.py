#!/usr/bin/env python
"""ML-10M full-graph single-chip training-step benchmark.

Builds the ``transductive_ml_10m`` configuration on a synthetic graph of
the real dataset's dimensions (69,878 x 10,677, 10M edges, 10 rating
levels — ``BASELINE.md``) and times full optimisation steps.

Usage::

    python scripts/bench_ml10m.py [--backend ell|xla] [--steps 10]
        [--edges 10000000] [--bf16] [--scan 1]

Round-1 reference point (same machine, xla edge-chunked path):
2.8 s/step = 14 M edge-msgs/s.  The chunked-ELL backend targets
>= 5x that (VERDICT round-1 item 1).
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="ell")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=69_878)
    ap.add_argument("--items", type=int, default=10_677)
    ap.add_argument("--batch", type=int, default=100_000)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--ell_k", type=int, default=64)
    ap.add_argument("--ell_chunk", type=int, default=None,
                    help="rematerialised row-chunk size (default: cfg)")
    ap.add_argument("--scan", type=int, default=1,
                    help="steps fused per dispatch")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import numpy as np

    from stargcn_tpu.data import DataIterator
    from stargcn_tpu.data.synthetic import synthetic_graph
    from stargcn_tpu.train import Trainer, build_model_config
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.utils import cfg_from_file, default_cfg

    cfg = default_cfg()
    cfg_from_file(os.path.join(ROOT, "configs", "transductive_ml_10m.yml"),
                  cfg)
    cfg.KERNEL.BACKEND = args.backend
    cfg.KERNEL.ELL_K = args.ell_k
    if args.ell_chunk is not None:
        cfg.KERNEL.ELL_CHUNK = args.ell_chunk
    cfg.KERNEL.ELL_BF16 = bool(args.bf16)
    cfg.TRAIN.RATING_BATCH_SIZE = args.batch
    cfg.TRAIN.SCAN_STEPS = args.scan

    t0 = time.time()
    g = synthetic_graph(
        num_users=args.users, num_items=args.items, num_edges=args.edges,
        rating_values=tuple(np.arange(0.5, 5.01, 0.5)), seed=123)
    csr = g["user", "movie"]
    rng = np.random.RandomState(123)
    pairs = csr.node_pair_ids
    perm = rng.permutation(pairs.shape[1])
    n_test = pairs.shape[1] // 10
    it = DataIterator(
        g, "user", "movie",
        test_node_pairs=pairs[:, perm[:n_test]],
        valid_node_pairs=pairs[:, perm[n_test:2 * n_test]],
        embed_P_mask=cfg.EMBED.MASK_PROP, embed_p_zero=0.0,
        embed_p_self=1.0, seed=123)
    print(f"graph+iterator build: {time.time()-t0:.1f}s "
          f"(E={csr.nnz}, R={len(csr.multi_link)})", flush=True)

    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link), num_edges=csr.nnz)
    print(f"backend={model_cfg.backend} edge_chunk={model_cfg.edge_chunk} "
          f"ell_k={model_cfg.ell_k} bf16={model_cfg.ell_bf16}", flush=True)
    t0 = time.time()
    trainer = Trainer(model_cfg, it, TrainSettings.from_cfg(cfg))
    print(f"trainer build (incl. packs): {time.time()-t0:.1f}s", flush=True)

    rs = it.rating_sampler(batch_size=trainer.train_batch, segment="train")
    recon = it.recon_nodes_sampler(batch_size=cfg.TRAIN.RECON_BATCH_SIZE)

    def pull():
        noise_dict, _, all_ids = next(recon)
        return next(rs), trainer.prepare_recon_batch(noise_dict, all_ids)

    k = args.scan

    def run_steps(n):
        """n optimisation steps (fused k at a time when --scan > 1)."""
        last = None
        if k > 1:
            for _ in range(-(-n // k)):
                batches = [pull() for _ in range(k)]
                last = trainer.train_chunk([b[0] for b in batches],
                                           [b[1] for b in batches])
        else:
            for _ in range(n):
                rb, cb = pull()
                last = trainer.train_iteration(rb, cb)
        import jax
        jax.block_until_ready(last["loss"])
        return last

    t0 = time.time()
    last = run_steps(k if k > 1 else 1)
    print(f"first step (compile): {time.time()-t0:.1f}s "
          f"loss={np.asarray(last['loss']).reshape(-1)[-1]:.4f}", flush=True)

    times = []
    n_win = 3
    per_win = max(args.steps // n_win, 1) * (k if k > 1 else 1)
    for w in range(n_win):
        t0 = time.time()
        last = run_steps(per_win)
        dt = (time.time() - t0) / per_win
        times.append(dt)
        print(f"window {w}: {dt*1e3:.0f} ms/step", flush=True)
    step_s = float(np.median(times))

    E = int(np.asarray(trainer.graph_data.edge_pad_mask).sum())
    edges_per_step = (model_cfg.nblocks * len(model_cfg.agg_units) * 2 * E)
    result = {
        "metric": "ml10m_train_step_edge_messages_per_s",
        "value": round(edges_per_step / step_s, 1),
        "unit": "edge_msgs/s",
        "step_ms": round(step_s * 1e3, 1),
        "backend": model_cfg.backend,
        "vs_round1_xla": round(2.8 / step_s, 2),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

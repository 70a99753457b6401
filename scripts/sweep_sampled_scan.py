#!/usr/bin/env python
"""Sweep the sampled-mode scan depth (steps fused per dispatch).

The ml10m_sampled bench headline uses SCAN_STEPS=5; deeper fusion
amortizes more of this environment's relay dispatch latency, but the
host plan+pack cost per step is fixed, so the win saturates.  Rounds
are interleaved across k values to control for relay weather
(BASELINE.md: identical work swings 10x between contention windows).
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, ".jax_cache"))

import numpy as np


def main():
    import bench
    from stargcn_tpu.train import build_model_config
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer

    ks = [int(x) for x in (sys.argv[1:] or ["5", "10", "20"])]
    rounds = 3
    steps_per_round = 20

    cfg = bench._ml10m_cfg()
    cfg.TRAIN.RATING_BATCH_SIZE = 4096
    cfg.TRAIN.RECON_BATCH_SIZE = 1024
    _, csr, it = bench.ml10m()
    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link), num_edges=csr.nnz)
    trainer = SampledTrainer(model_cfg, it, TrainSettings.from_cfg(cfg),
                             fanout=8, backend="xla")
    rs = it.rating_sampler(batch_size=trainer.train_batch, segment="train")
    recon = it.recon_nodes_sampler(batch_size=1024)

    # compile each k once up front (compiles don't pollute the timing)
    for k in ks:
        stats = trainer.train_chunk(
            [trainer._make_batch(rs, recon) for _ in range(k)])
        float(np.asarray(stats["loss"])[-1])
        print(f"compiled k={k}", flush=True)

    results = {k: [] for k in ks}
    for r in range(rounds):
        for k in ks:  # interleaved: every k sees every weather window
            n_chunks = max(steps_per_round // k, 1)
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                stats = trainer.train_chunk(
                    [trainer._make_batch(rs, recon) for _ in range(k)])
            float(np.asarray(stats["loss"])[-1])
            dt = (time.perf_counter() - t0) / (n_chunks * k)
            results[k].append(dt * 1e3)
            print(f"round {r} k={k}: {dt*1e3:.1f} ms/step", flush=True)

    print("\nmedians:", flush=True)
    for k in ks:
        med = sorted(results[k])[len(results[k]) // 2]
        print(f"  k={k}: {med:.1f} ms/step  (all: "
              f"{[round(x, 1) for x in results[k]]})", flush=True)


if __name__ == "__main__":
    main()

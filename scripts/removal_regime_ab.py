#!/usr/bin/env python
"""A/B the two REMOVE_RATING exclusion formulations of the device
planner at ML-10M production shapes (interleaved-window protocol).

Regime A (one-hot-MXU, round 5): per-direction (B, n_t) bf16 one-hot;
per-node counts = column sums; hit test = one dot-general per
layer/direction.  Regime B (lex-sorted rank tables): arange
searchsorted + bounded candidate compare — the round-4 formulation,
now scale-proof (two-key sort, no int32 edge keys).

Both run the SAME fused devplan chunk (scan=5) with removal ON, and a
removal-OFF control, rotating inside every measurement window so relay
weather hits all arms equally.  Loss equality between the arms is
asserted (the exclusion semantics are identical).

    python scripts/removal_regime_ab.py [--windows 4] [--chunks 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=4)
    p.add_argument("--chunks", type=int, default=2)
    p.add_argument("--scan", type=int, default=5)
    args = p.parse_args()

    import jax

    import bench
    from stargcn_tpu.graph import device_sampling
    from stargcn_tpu.train import build_model_config
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer

    cfg = bench._ml10m_cfg()
    cfg.TRAIN.RATING_BATCH_SIZE = 4096
    cfg.TRAIN.RECON_BATCH_SIZE = 1024
    _, csr, it = bench.ml10m()
    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link), num_edges=csr.nnz)
    print(f"# remove_rating={cfg.MODEL.REMOVE_RATING} "
          f"nblocks={model_cfg.nblocks} layers={len(model_cfg.agg_units)}",
          flush=True)

    arms = {}
    scan = args.scan

    def make_arm(name, onehot_max, remove):
        # zero BOTH one-hot budgets for the ranktab arm — otherwise the
        # planner falls through to the slot-space one-hot and the arm
        # measures the wrong formulation (round-5 review finding)
        device_sampling.EXCLUDE_ONEHOT_MAX_ELEMS = onehot_max
        device_sampling.EXCLUDE_SLOT_ONEHOT_MAX_ELEMS = (
            onehot_max if onehot_max == 0 else 1 << 31)
        c = bench._ml10m_cfg()
        c.TRAIN.RATING_BATCH_SIZE = 4096
        c.TRAIN.RECON_BATCH_SIZE = 1024
        c.MODEL.REMOVE_RATING = remove
        mc = build_model_config(c, csr.shape[0], csr.shape[1],
                                len(csr.multi_link), num_edges=csr.nnz)
        tr = SampledTrainer(mc, it, TrainSettings.from_cfg(c), fanout=8,
                            backend="xla", plan_device=True)
        rs = it.rating_sampler(batch_size=tr.train_batch, segment="train")
        rc = it.recon_nodes_sampler(batch_size=1024)
        st = tr.train_chunk([tr._make_batch(rs, rc) for _ in range(scan)])
        loss0 = float(np.asarray(st["loss"])[-1])  # compile under THIS regime
        arms[name] = dict(tr=tr, rs=rs, rc=rc, windows=[], loss0=loss0)
        print(f"# {name} compiled, first-chunk last loss {loss0:.4f}",
              flush=True)

    make_arm("onehot_on", 1 << 29, True)
    make_arm("ranktab_on", 0, True)
    make_arm("removal_off", 1 << 29, False)

    for w in range(args.windows):
        for name, a in arms.items():
            tr, rs, rc = a["tr"], a["rs"], a["rc"]
            t0 = time.perf_counter()
            for _ in range(args.chunks):
                st = tr.train_chunk(
                    [tr._make_batch(rs, rc) for _ in range(scan)])
            float(np.asarray(st["loss"])[-1])
            a["windows"].append(
                (time.perf_counter() - t0) / (args.chunks * scan) * 1e3)
        print(f"# window {w}: " + " ".join(
            f"{n}={a['windows'][-1]:.1f}ms" for n, a in arms.items()),
            flush=True)

    med = bench._median

    out = {n: {"step_ms_median": round(med(a["windows"]), 1),
               "step_ms_all": [round(x, 1) for x in a["windows"]]}
           for n, a in arms.items()}
    out["removal_cost_onehot_ms"] = round(
        med(arms["onehot_on"]["windows"])
        - med(arms["removal_off"]["windows"]), 1)
    out["removal_cost_ranktab_ms"] = round(
        med(arms["ranktab_on"]["windows"])
        - med(arms["removal_off"]["windows"]), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

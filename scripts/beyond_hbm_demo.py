#!/usr/bin/env python
"""Beyond-HBM training demo: a graph too large for ANY full-graph
backend on one chip, trained end-to-end in sampled mini-batch mode.

Scale (default): 400k users x 50k items, 50M edges, 10 rating levels.
Full-graph is impossible here by arithmetic, not assertion —

* bitdense: (R, Nu, Ni) at 1 bit = 10 * 400e3 * 50e3 / 8 B = 25 GB
  per direction layout, >1.5x v5e HBM (16 GB) before params/activations;
* chunked-ELL / dense: proportionally worse (bf16 dense would be 400 GB).

(500k users compiles — XLA memory analysis: 3.7 GB temp / 0.5 GB args —
but this environment's TPU relay RESOURCE_EXHAUSTEDs loading the model-
update program above ~400k users regardless of caps/batch/edge count;
the cliff was bisected at 400k-ok / 425k-fail with raw HBM probes
allocating 15 GB fine at the same moment.  See BASELINE.md round 5.)

Sampled mode's per-step footprint is O(batch * fanout^L), independent
of graph size — this is the capability the two-phase plan/execute
machinery exists for (the TPU answer to the reference's
``gen_plan``/``heter_sage``, ``mxgraph/layers/layers.py:260-385``,
whose host-resident graph had the same role on GPU).

``--plan_device`` moves the ENTIRE planning phase inside the jitted
step (``graph/device_sampling.py``), split into two dispatches
(plan program | update program, ``plan_split`` — the fused single
program trips the relay's program-load limit at this scale while the
same computation as two programs runs; everything stays on-device
between them).  At this scale the planner runs
its DEDUP regime (frontier caps < node counts: capped-unique double
sorts + binary-search position maps — the true beyond-HBM machinery,
not the dense-frontier fast path the ML-10M bench rides) and the
lex-sorted rank-table REMOVE_RATING formulation (the id product
2.0e10 exceeds int32, which the round-4 edge-key formulation could
not represent).

Prints one JSON line: steps/s, rating-pairs/s, first/last train loss,
valid RMSE, the HBM arithmetic above, and (plan_device) the dedup
regime + overflow accounting.

    python scripts/beyond_hbm_demo.py [--edges 50000000] [--iters 200]
        [--plan_device] [--scan 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _round_up_16(n):
    return max(16, -(-n // 16) * 16)


def run(users=400_000, items=50_000, edges=50_000_000, iters=200,
        batch=4096, fanout=8, plan_device=False, scan=5, seed=7,
        holdout=200_000, bf16=False,
        log=lambda *a: print(*a, flush=True)):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    import jax

    from stargcn_tpu.data import DataIterator
    from stargcn_tpu.data.synthetic import synthetic_graph
    from stargcn_tpu.train import build_model_config
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer
    from stargcn_tpu.utils import cfg_from_file, default_cfg

    levels = 10
    bitdense_gb = levels * users * items / 8 / 1e9
    t0 = time.time()
    g = synthetic_graph(num_users=users, num_items=items,
                        num_edges=edges,
                        rating_values=tuple(np.arange(0.5, 5.01, 0.5)),
                        seed=seed)
    csr = g["user", "movie"]
    build_s = time.time() - t0
    log(f"# graph built: {csr.nnz} edges in {build_s:.0f}s")

    rng = np.random.RandomState(seed)
    pairs = csr.node_pair_ids
    n_hold = min(holdout, pairs.shape[1] // 5)
    hold = rng.permutation(pairs.shape[1])[:n_hold]
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, hold[:n_hold // 2]],
                      valid_node_pairs=pairs[:, hold[n_hold // 2:]],
                      embed_P_mask=0.1, embed_p_zero=0.0,
                      embed_p_self=1.0, seed=seed)

    cfg = default_cfg()
    cfg_from_file(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs",
        "transductive_ml_10m.yml"), cfg)
    cfg.DATASET.NAME = "synthetic"
    cfg.TRAIN.RATING_BATCH_SIZE = batch
    cfg.TRAIN.RECON_BATCH_SIZE = 1024
    cfg.TRAIN.MAX_ITER = iters
    cfg.TRAIN.VALID_INTERVAL = max(iters // 2, 10)
    cfg.TRAIN.LOG_INTERVAL = 10
    if bf16:
        # sampled-path mixed precision (measured: 656 -> 600 ms/step at
        # this scale — the planner/gather terms dominate, so the win is
        # the encoder slice only)
        cfg.MODEL.COMPUTE_DTYPE = "bfloat16"
    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link), num_edges=csr.nnz)
    t0 = time.time()
    # remat: at this scale the probed user frontier reaches ~260k rows;
    # the per-level (N, K, E)/(N, R, E) residuals OOM 16 GB HBM unless
    # each encoder level recomputes them in the backward.
    trainer = SampledTrainer(model_cfg, it, TrainSettings.from_cfg(cfg),
                             fanout=fanout, plan_device=plan_device,
                             remat=True, plan_split=plan_device)
    setup_s = time.time() - t0
    dedup = {t: trainer.caps[t] < n
             for t, n in (("user", users), ("item", items))}
    log(f"# trainer ready in {setup_s:.0f}s; caps {trainer.caps} "
        f"(dedup regime: {dedup}); remove_rating={trainer.do_remove}")

    def mem(tag):
        try:
            st = jax.local_devices()[0].memory_stats() or {}
            log(f"# hbm[{tag}]: in_use="
                f"{st.get('bytes_in_use', 0)/1e9:.2f}GB peak="
                f"{st.get('peak_bytes_in_use', 0)/1e9:.2f}GB limit="
                f"{st.get('bytes_limit', 0)/1e9:.2f}GB")
        except Exception as e:
            log(f"# hbm[{tag}]: unavailable ({type(e).__name__})")

    mem("after_setup")
    rs = it.rating_sampler(batch_size=trainer.train_batch, segment="train")
    recon = it.recon_nodes_sampler(batch_size=1024)

    def chunk():
        return [trainer._build_batch_safe(rs, recon) for _ in range(scan)]

    losses = []
    overflow_steps = 0
    t0 = time.time()
    stats = trainer.train_chunk(chunk())  # compile
    float(np.asarray(stats["loss"]).reshape(-1)[-1])
    compile_s = time.time() - t0
    log(f"# first chunk (compile) in {compile_s:.0f}s")
    mem("after_first_chunk")
    # Pre-flight cap growth (the fit() overflow-recovery contract,
    # replicated here so the TIMED window never trains on rejected
    # steps): the device planner's dense-side fast path samples
    # neighbors for EVERY node of a clamped type, so its frontier
    # needs can exceed the host-probe-derived caps — grow until a
    # probe chunk reports no overflow (each growth recompiles once).
    if plan_device:
        for round_i in range(4):
            st = jax.device_get(trainer.train_chunk(chunk()))
            if not int(np.asarray(st["overflow"]).sum()):
                break
            need = {t: int(np.asarray(st[f"needed_{t}"]).max())
                    for t in ("user", "item")}
            need_ex = int(np.asarray(st["needed_exclude"]).max())
            log(f"# overflow pre-flight: growing caps to cover {need} "
                f"/ exclude {need_ex}")
            trainer._grow_caps(need, slack=1.15)
            if need_ex > trainer.exclude_cap:
                trainer.exclude_cap = _round_up_16(2 * need_ex)
        log(f"# caps after pre-flight: {trainer.caps} "
            f"(exclude {trainer.exclude_cap})")
    t0 = time.time()
    pending = []
    n_chunks = max(iters // scan, 1)
    for i in range(n_chunks):
        stats = trainer.train_chunk(chunk())
        pending.append(stats)
        if (i + 1) % 4 == 0 or i == n_chunks - 1:
            # bound the dispatch queue: each queued chunk holds its
            # feed buffers in HBM until it executes
            for st in jax.device_get(pending):
                losses.extend(np.asarray(st["loss"]).reshape(-1).tolist())
                if "overflow" in st:
                    overflow_steps += int(
                        np.asarray(st["overflow"]).sum())
            pending.clear()
    train_s = time.time() - t0
    steps_done = n_chunks * scan
    log(f"# {steps_done} steps in {train_s:.0f}s "
        f"({train_s / steps_done * 1e3:.0f} ms/step), "
        f"{overflow_steps} overflow-rejected")
    rmse = trainer.evaluate("valid")

    out = {
        "metric": "beyond_hbm_sampled_training",
        "graph": f"{users}x{items}, {csr.nnz} edges, {levels} levels",
        "bitdense_layout_gb": round(bitdense_gb, 1),
        "hbm_gb": 16,
        "full_graph_possible": bitdense_gb < 16,
        "plan_device": bool(plan_device),
        "scan_steps": scan,
        "steps_per_s": round(steps_done / train_s, 2),
        "ms_per_step": round(train_s / steps_done * 1e3, 1),
        "rating_pairs_per_s": round(steps_done * batch / train_s, 1),
        "loss_first10": round(float(np.mean(losses[:10])), 4),
        "loss_last10": round(float(np.mean(losses[-10:])), 4),
        "loss_decreased": bool(np.mean(losses[-10:]) < np.mean(losses[:10])),
        "valid_rmse": [round(float(x), 4) for x in np.asarray(rmse)],
        "graph_build_s": round(build_s, 1),
        "trainer_setup_s": round(setup_s, 1),
        "compile_s": round(compile_s, 1),
        "frontier_caps": dict(trainer.caps),
        "dedup_regime": dedup,
        "remove_rating": bool(trainer.do_remove),
    }
    if plan_device:
        out["overflow_steps"] = overflow_steps
        out["id_product"] = users * items  # > 2^31: needs the lexsort
        b = trainer._pack_batch(trainer._build_batch_safe(rs, recon))
        out["feed_mb"] = round((b[0].nbytes + b[1].nbytes) / 1e6, 2)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=400_000)
    p.add_argument("--items", type=int, default=50_000)
    p.add_argument("--edges", type=int, default=50_000_000)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--fanout", type=int, default=8)
    p.add_argument("--plan_device", action="store_true")
    p.add_argument("--scan", type=int, default=5)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()
    out = run(users=args.users, items=args.items, edges=args.edges,
              iters=args.iters, batch=args.batch, fanout=args.fanout,
              plan_device=args.plan_device, scan=args.scan,
              bf16=args.bf16)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""STAR-GCN training CLI (TPU-native).

Equivalent of the reference experiment driver
(``experiments/STAR-GCN.py``; CLI contract at ``README.md:35``)::

    python experiments/train.py --cfg configs/transductive_ml_100k.yml
    python experiments/train.py --cfg ... --save_dir out --seed 123
    python experiments/train.py --dataset synthetic --max_iter 200

``--dataset synthetic`` trains on an in-memory MovieLens-like graph (no
raw data needed — this environment cannot download GroupLens archives).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Train STAR-GCN on TPU.")
    parser.add_argument("--cfg", dest="cfg_file", default=None, type=str)
    parser.add_argument("--save_dir", type=str, default=None)
    parser.add_argument("--dataset", type=str, default=None,
                        help="ml-100k | ml-1m | ml-10m | synthetic "
                             "(overrides cfg)")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--inductive", action="store_true")
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--silent", action="store_true")
    parser.add_argument("--max_iter", default=None, type=int)
    parser.add_argument("--platform", default=None, type=str,
                        help="force a JAX platform (e.g. cpu)")
    parser.add_argument("--backend", default=None, type=str,
                        help="aggregation kernel backend: "
                             "auto | xla | dense")
    parser.add_argument("--mesh", default=None, type=str,
                        help="device mesh as DATAxMODEL, e.g. 2x4")
    parser.add_argument("--profile", default=None, type=str,
                        help="capture a jax.profiler trace of the first "
                             "valid interval into this directory")
    parser.add_argument("--coordinator", default=None, type=str,
                        help="multi-host coordinator address "
                             "(host:port); requires --num_processes and "
                             "--process_id")
    parser.add_argument("--num_processes", default=None, type=int)
    parser.add_argument("--process_id", default=None, type=int)
    parser.add_argument("--resume", default=None, type=str,
                        help="restore params + optimizer state from a "
                             "checkpoint (.msgpack) before training")
    parser.add_argument("--num_neighbors", default=None, type=int,
                        help="override GRAPH_SAMPLER.NUM_NEIGHBORS "
                             "(> 0 selects the sampled mini-batch "
                             "trainer; -1 = full-graph)")
    parser.add_argument("--device_sampler", action="store_true",
                        default=None,
                        help="sample batches ON DEVICE inside the fused "
                             "scan (TRAIN.DEVICE_SAMPLER).  DEFAULT ON "
                             "for single-mesh TPU runs (same uniform "
                             "batch distribution, zero per-step host "
                             "transfers — measured 2.4x over the "
                             "host-fed pipeline); --no_device_sampler "
                             "restores host sampling")
    parser.add_argument("--no_device_sampler", action="store_true")
    parser.add_argument("--prefetch", action="store_true",
                        help="sampled mode: build plans in a one-ahead "
                             "producer thread (OMP team capped at "
                             "--prefetch_omp_threads; passive OMP waits "
                             "set before JAX import).  Default serial — "
                             "measured faster on few-core hosts")
    parser.add_argument("--prefetch_omp_threads", default=2, type=int)
    parser.add_argument("--plan_device", action="store_true",
                        help="sampled mode: build the sampling plan ON "
                             "DEVICE inside the jitted step (graph/"
                             "device_sampling.py) — per-step host work "
                             "and transfer drop to the batch ids + "
                             "noise.  Neighbor draws use "
                             "with-replacement fanout sampling (device "
                             "RNG) instead of the host path's Floyd "
                             "draws")
    parser.add_argument("--plan_split", action="store_true",
                        help="with --plan_device: run planning and the "
                             "model update as TWO device-resident "
                             "programs instead of one fused step — "
                             "required at beyond-HBM node counts where "
                             "the fused program trips this "
                             "environment's relay program-load limit "
                             "(BASELINE.md round 5)")
    parser.add_argument("--remat", action="store_true",
                        help="sampled mode: per-level jax.checkpoint — "
                             "recompute the (N,K,E)/(N,R,E) level "
                             "residuals in the backward; required at "
                             "250k+-row frontiers on 16 GB HBM")
    args = parser.parse_args()

    if args.prefetch:
        # libgomp reads these at startup: spin-waiting planner threads
        # starve the TPU-dispatch threads on few-core hosts
        # (BASELINE.md host-threading finding).  Must precede the first
        # OpenMP team, hence before any heavy import.
        os.environ.setdefault("OMP_WAIT_POLICY", "PASSIVE")
        os.environ.setdefault("GOMP_SPINCOUNT", "0")

    if args.platform:
        if args.platform == "cpu" and args.mesh:
            d, m = (int(x) for x in args.mesh.lower().split("x"))
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    f"{flags} --xla_force_host_platform_device_count={d * m}"
                ).strip()
        import jax
        jax.config.update("jax_platforms", args.platform)

    from experiments.common import build_dataset
    from stargcn_tpu.graph import kernels as gk
    from stargcn_tpu.train import Trainer
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.utils import (cfg_from_file, default_cfg,
                                   logging_config, save_cfg_dir)

    cfg = default_cfg()
    if args.cfg_file:
        cfg_from_file(args.cfg_file, cfg)
    if args.dataset:
        cfg.DATASET.NAME = args.dataset
    if args.inductive:
        cfg.DATASET.IS_INDUCTIVE = True
    if args.seed is not None:
        cfg.SEED = args.seed
    if args.max_iter is not None:
        cfg.TRAIN.MAX_ITER = args.max_iter
    if args.backend is not None:
        cfg.KERNEL.BACKEND = args.backend
    if args.num_neighbors is not None:
        cfg.GRAPH_SAMPLER.NUM_NEIGHBORS = args.num_neighbors
    if args.no_device_sampler:
        cfg.TRAIN.DEVICE_SAMPLER = False
    elif args.device_sampler:
        cfg.TRAIN.DEVICE_SAMPLER = True
    elif not cfg.TRAIN.get("DEVICE_SAMPLER", False):
        # default ON where semantics allow: TPU, full-graph mode, no
        # mesh (the device sampler draws the same uniform edge batches
        # with device RNG; the host path remains the parity A/B)
        import jax as _jax
        cfg.TRAIN.DEVICE_SAMPLER = (
            _jax.default_backend() == "tpu"
            and int(cfg.GRAPH_SAMPLER.NUM_NEIGHBORS) <= 0
            and cfg.PARALLEL.get("DATA_AXIS", 1)
            * cfg.PARALLEL.get("MODEL_AXIS", 1) <= 1
            and args.mesh is None)
    if args.mesh is not None:
        d, m = (int(x) for x in args.mesh.lower().split("x"))
        cfg.PARALLEL.DATA_AXIS = d
        cfg.PARALLEL.MODEL_AXIS = m

    save_dir = args.save_dir
    if save_dir is None and args.cfg_file is not None:
        save_dir = os.path.splitext(args.cfg_file)[0] + "_runs"
    save_id = 0
    if save_dir:
        save_id = save_cfg_dir(save_dir, cfg)
        logging_config(save_dir, name=f"log{save_id}",
                       no_console=args.silent)
    else:
        logging.basicConfig(level=logging.INFO)
    logging.info(cfg)

    np.random.seed(cfg.SEED)
    gk.set_seed(cfg.SEED)

    # ---- dataset ----
    name_user, name_item = "user", "movie"
    graph, data_iter, model_cfg = build_dataset(cfg, args.data_root)
    if args.coordinator:
        from stargcn_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    mesh = None
    if cfg.PARALLEL.DATA_AXIS * cfg.PARALLEL.MODEL_AXIS > 1:
        from stargcn_tpu.parallel import make_mesh

        mesh = make_mesh(data=cfg.PARALLEL.DATA_AXIS,
                         model=cfg.PARALLEL.MODEL_AXIS)
    fanout = int(cfg.GRAPH_SAMPLER.NUM_NEIGHBORS)
    if fanout > 0:
        # Sampled mini-batch mode (reference gen_plan/heter_sage path,
        # selected by GRAPH_SAMPLER.NUM_NEIGHBORS > 0, STAR-GCN.py:57).
        from stargcn_tpu.train.sampled_loop import SampledTrainer

        # Sampled device backend: 'pallas' routes the ELL pooling
        # through the hand kernels (ops/pallas_kernels.py); 'auto'
        # resolves by the measured fwd+bwd crossover — XLA at every
        # training shape (resolve_sampled_backend; the Pallas tier is
        # a forward/serving win only); anything else uses the XLA
        # formulation.
        sampled_backend = (cfg.KERNEL.BACKEND
                          if cfg.KERNEL.BACKEND in ("pallas", "auto")
                          else "xla")
        trainer = SampledTrainer(
            model_cfg, data_iter, TrainSettings.from_cfg(cfg),
            fanout=fanout, save_dir=save_dir, save_id=save_id,
            name_user=name_user, name_item=name_item, mesh=mesh,
            backend=sampled_backend, plan_device=args.plan_device,
            plan_split=args.plan_split, remat=args.remat)
    else:
        trainer = Trainer(model_cfg, data_iter,
                          TrainSettings.from_cfg(cfg),
                          save_dir=save_dir, save_id=save_id, mesh=mesh)
    if args.resume:
        trainer.restore_checkpoint(args.resume)
        logging.info("resumed from %s", args.resume)
    if args.profile:
        from stargcn_tpu.utils.profiling import trace

        with trace(args.profile):
            trainer.fit(max_iter=cfg.TRAIN.VALID_INTERVAL)
        logging.info("profile trace written to %s", args.profile)
    fit_kw = {}
    if fanout > 0 and args.prefetch:
        fit_kw = dict(prefetch=True,
                      prefetch_omp_threads=args.prefetch_omp_threads)
    result = trainer.fit(**fit_kw)
    logging.info("result: %s", result)
    return result


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""STAR-GCN serving CLI: rating prediction and top-K recommendation.

Two modes:

1. Export-and-serve (needs the dataset + a training checkpoint)::

       python experiments/predict.py --cfg configs/transductive_ml_100k.yml \
           --resume out/ckpt_best0.msgpack --save_artifact art.npz \
           --users 1,2,3 --topk 10

2. Artifact-only serving (no dataset, no model code paths — just the
   exported ``.npz`` scoring bundle)::

       python experiments/predict.py --artifact art.npz --users 1,2,3 --topk 10
       python experiments/predict.py --artifact art.npz --pairs 1:10,2:33

Output: one JSON line per request batch.
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Serve STAR-GCN.")
    parser.add_argument("--cfg", dest="cfg_file", default=None, type=str)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--resume", default=None, type=str,
                        help="checkpoint (.msgpack) with trained params")
    parser.add_argument("--segment", default="test",
                        choices=["valid", "test"],
                        help="graph variant to encode (as in evaluation)")
    parser.add_argument("--artifact", default=None, type=str,
                        help="load a previously exported .npz artifact "
                             "instead of building one")
    parser.add_argument("--save_artifact", default=None, type=str,
                        help="write the exported artifact to this path")
    parser.add_argument("--backend", default=None, type=str)
    parser.add_argument("--platform", default=None, type=str)
    parser.add_argument("--users", default=None, type=str,
                        help="comma list of user ids to recommend for")
    parser.add_argument("--topk", default=10, type=int)
    parser.add_argument("--include_rated", action="store_true",
                        help="allow recommending already-rated items")
    parser.add_argument("--pairs", default=None, type=str,
                        help="comma list of user:item pairs to score")
    parser.add_argument("--rank_eval", action="store_true",
                        help="compute HR@K/NDCG@K over the chosen segment "
                             "(needs the dataset; see stargcn_tpu/ranking.py)")
    parser.add_argument("--rank_k", default=10, type=int)
    parser.add_argument("--rank_negatives", default=100, type=int)
    parser.add_argument("--rank_max_positives", default=None, type=int,
                        help="subsample the segment's positives (fixed seed)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from stargcn_tpu.serve import Predictor, ServingArtifact, export_serving

    data_iter = None
    if args.artifact:
        art = ServingArtifact.load(args.artifact)
        if args.rank_eval:
            parser.error("--rank_eval needs the dataset (--cfg/--dataset), "
                         "not --artifact: negatives must be drawn from the "
                         "evaluation graph")
    else:
        from experiments.common import build_dataset
        from stargcn_tpu.graph import kernels as gk
        from stargcn_tpu.train import Trainer
        from stargcn_tpu.train.loop import TrainSettings
        from stargcn_tpu.utils import cfg_from_file, default_cfg

        cfg = default_cfg()
        if args.cfg_file:
            cfg_from_file(args.cfg_file, cfg)
        if args.dataset:
            cfg.DATASET.NAME = args.dataset
        if args.seed is not None:
            cfg.SEED = args.seed
        if args.backend is not None:
            cfg.KERNEL.BACKEND = args.backend
        np.random.seed(cfg.SEED)
        gk.set_seed(cfg.SEED)
        _, data_iter, model_cfg = build_dataset(cfg, args.data_root)
        trainer = Trainer(model_cfg, data_iter, TrainSettings.from_cfg(cfg))
        if args.resume:
            trainer.restore_checkpoint(args.resume)
            logging.info("restored %s", args.resume)
        else:
            logging.warning("no --resume checkpoint: serving UNTRAINED "
                            "parameters (smoke-test mode)")
        art = export_serving(trainer, segment=args.segment)
        if args.save_artifact:
            art.save(args.save_artifact)
            logging.info("artifact written to %s", args.save_artifact)

    if args.rank_eval:
        from stargcn_tpu.ranking import rank_eval_from_iterator
        out = rank_eval_from_iterator(
            art, data_iter, segment=args.segment,
            num_negatives=args.rank_negatives, k=args.rank_k,
            max_positives=args.rank_max_positives)
        print(json.dumps({"mode": "rank_eval", **out}))

    pred = Predictor(art)
    if args.pairs:
        uu, ii = zip(*(p.split(":") for p in args.pairs.split(",")))
        uu = np.array([int(x) for x in uu], np.int32)
        ii = np.array([int(x) for x in ii], np.int32)
        scores = pred.predict(uu, ii)
        print(json.dumps({"mode": "predict",
                          "pairs": [[int(u), int(i)] for u, i in zip(uu, ii)],
                          "ratings": [round(float(s), 4) for s in scores]}))
    if args.users:
        users = np.array([int(x) for x in args.users.split(",")], np.int32)
        idx, vals = pred.recommend(users, k=args.topk,
                                   exclude_rated=not args.include_rated)
        for r, u in enumerate(users):
            print(json.dumps({"mode": "recommend", "user": int(u),
                              "items": idx[r].tolist(),
                              "ratings": [round(float(v), 4)
                                          for v in vals[r]]}))
    if not args.pairs and not args.users:
        print(json.dumps({"mode": "info", "num_users": art.num_users,
                          "num_items": art.num_items,
                          "feat_dim": int(art.user_feats.shape[1])}))


if __name__ == "__main__":
    main()

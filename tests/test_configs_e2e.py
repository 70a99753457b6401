"""Every shipped config builds a Trainer and survives training steps.

Catches config->model translation bugs across the whole experiment
matrix (3 transductive + 12 inductive) on a tiny synthetic graph.
"""

import glob
import os

import numpy as np
import pytest

from stargcn_tpu.data import DataIterator
from stargcn_tpu.data.synthetic import synthetic_graph
from stargcn_tpu.train import Trainer, build_model_config
from stargcn_tpu.train.loop import TrainSettings
from stargcn_tpu.utils import cfg_from_file

CONFIGS = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "*.yml")))


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=[
    os.path.basename(p) for p in CONFIGS])
def test_config_end_to_end(cfg_path):
    cfg = cfg_from_file(cfg_path)
    # shrink to test scale (hyperparameter STRUCTURE stays intact)
    cfg.TRAIN.RATING_BATCH_SIZE = 64
    cfg.TRAIN.SCAN_STEPS = 1
    g = synthetic_graph(num_users=40, num_items=30, num_edges=600, seed=9)
    csr = g["user", "movie"]
    rng = np.random.RandomState(0)
    pairs = csr.node_pair_ids

    if cfg.DATASET.IS_INDUCTIVE:
        key = "movie" if cfg.DATASET.INDUCTIVE_KEY == "item" else "user"
        n_nodes = 30 if key == "movie" else 40
        axis = 1 if key == "movie" else 0
        ids = rng.permutation(n_nodes).astype(np.int32)
        n_test = max(2, n_nodes // 5)
        test_ids, valid_ids = ids[:n_test], ids[n_test:2 * n_test]
        train_ids = ids[2 * n_test:]
        test_pairs = pairs[:, np.isin(pairs[axis], test_ids)]
        valid_pairs = pairs[:, np.isin(pairs[axis], valid_ids)]
        other = "user" if key == "movie" else "movie"
        it = DataIterator(
            g, "user", "movie", is_inductive=True,
            test_node_pairs=test_pairs, valid_node_pairs=valid_pairs,
            inductive_key=key, inductive_train_ids=train_ids,
            inductive_valid_ids=valid_ids,
            embed_P_mask=cfg.EMBED.MASK_PROP,
            embed_p_zero={key: cfg.EMBED.P_ZERO, other: 0.0},
            embed_p_self={key: 1.0 - cfg.EMBED.P_ZERO, other: 1.0},
            seed=5)
    else:
        perm = rng.permutation(pairs.shape[1])
        it = DataIterator(
            g, "user", "movie",
            test_node_pairs=pairs[:, perm[:100]],
            valid_node_pairs=pairs[:, perm[100:160]],
            embed_P_mask=cfg.EMBED.MASK_PROP,
            embed_p_zero=cfg.EMBED.P_ZERO,
            embed_p_self=1.0 - cfg.EMBED.P_ZERO, seed=5)

    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link))
    trainer = Trainer(model_cfg, it, TrainSettings.from_cfg(cfg))
    result = trainer.fit(max_iter=10)
    assert np.isfinite(result["best_valid_rmse"])

    # Sampled mini-batch mode (GRAPH_SAMPLER.NUM_NEIGHBORS > 0) runs the
    # same config end-to-end with the full schedule.
    from stargcn_tpu.train.sampled_loop import SampledTrainer

    settings = TrainSettings.from_cfg(cfg)
    settings.recon_batch_size = min(settings.recon_batch_size, 16)
    sampled = SampledTrainer(model_cfg, it, settings, fanout=4)
    s_result = sampled.fit(max_iter=10, log=lambda *_: None)
    assert np.isfinite(s_result["best_valid_rmse"])

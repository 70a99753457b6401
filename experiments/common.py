"""Shared experiment-CLI plumbing: dataset -> DataIterator -> model cfg.

Used by ``experiments/train.py`` and ``experiments/predict.py`` so both
build bit-identical pipelines from the same config (the reference keeps
this inline in its single driver, ``experiments/STAR-GCN.py:129-149``).
"""

import logging

import numpy as np


def build_dataset(cfg, data_root=None):
    """Build ``(graph, data_iter, model_cfg)`` from a merged config.

    ``DATASET.NAME == 'synthetic'`` generates an in-memory
    MovieLens-like graph (this environment cannot download GroupLens
    archives); real names go through ``LoadData``.
    """
    from stargcn_tpu.data import DataIterator, LoadData
    from stargcn_tpu.data.synthetic import synthetic_graph
    from stargcn_tpu.train import build_model_config

    name_user, name_item = "user", "movie"
    if cfg.DATASET.NAME == "synthetic":
        graph = synthetic_graph(seed=cfg.SEED)
        csr = graph[name_user, name_item]
        rng = np.random.RandomState(cfg.SEED)
        pairs = csr.node_pair_ids
        perm = rng.permutation(pairs.shape[1])
        n_test = int(np.ceil(pairs.shape[1] * cfg.DATASET.TEST_RATIO))
        n_valid = int(np.ceil((pairs.shape[1] - n_test)
                              * cfg.DATASET.VALID_RATIO))
        test_pairs = pairs[:, perm[:n_test]]
        valid_pairs = pairs[:, perm[n_test:n_test + n_valid]]
        inductive_kwargs = {}
        assert not cfg.DATASET.IS_INDUCTIVE, \
            "synthetic runs are transductive"
    else:
        data = LoadData(
            cfg.DATASET.NAME, root=data_root,
            use_inductive=cfg.DATASET.IS_INDUCTIVE,
            test_ratio=cfg.DATASET.TEST_RATIO,
            val_ratio=cfg.DATASET.VALID_RATIO,
            inductive_key=cfg.DATASET.INDUCTIVE_KEY,
            inductive_node_frac=cfg.DATASET.INDUCTIVE_NODE_FRAC,
            inductive_edge_frac=cfg.DATASET.INDUCTIVE_EDGE_FRAC,
            seed=cfg.SEED)
        logging.info(data)
        graph = data.graph
        graph.check_continous_node_ids()
        test_pairs, _ = data.test_data
        valid_pairs, _ = data.valid_data
        inductive_kwargs = {}
        if cfg.DATASET.IS_INDUCTIVE:
            key = (name_item if cfg.DATASET.INDUCTIVE_KEY == "item"
                   else name_user)
            other = name_user if key == name_item else name_item
            inductive_kwargs = dict(
                is_inductive=True, inductive_key=key,
                inductive_train_ids=data.inductive_train_ids,
                inductive_valid_ids=data.inductive_valid_ids,
                embed_p_zero={key: cfg.EMBED.P_ZERO, other: 0.0},
                embed_p_self={key: 1.0 - cfg.EMBED.P_ZERO, other: 1.0})

    if not inductive_kwargs:
        inductive_kwargs = dict(
            embed_p_zero=cfg.EMBED.P_ZERO,
            embed_p_self=1.0 - cfg.EMBED.P_ZERO)

    data_iter = DataIterator(
        graph, name_user, name_item,
        test_node_pairs=test_pairs, valid_node_pairs=valid_pairs,
        embed_P_mask=cfg.EMBED.MASK_PROP, seed=cfg.SEED,
        **inductive_kwargs)

    csr = graph[name_user, name_item]
    model_cfg = build_model_config(
        cfg, num_users=csr.shape[0], num_items=csr.shape[1],
        num_links=len(csr.multi_link), num_edges=csr.nnz)
    return graph, data_iter, model_cfg

#!/usr/bin/env python
"""Virtual-mesh validation at 16/32 devices, odd shapes (VERDICT r3 #8).

Launched by ``tests/test_mesh_scale.py`` with
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` in the
environment.  Runs, on a ``data_ax x model_ax`` CPU mesh:

  * a full-graph sharded training step + the device-sampler scan chunk,
  * a sampled-mode (beyond-HBM) sharded step,
  * the perfmodel-vs-compiled-HLO collective check
    (``parallel/perfmodel.py``) when the model axis is sharded,

with node counts NOT divisible by the model axis (the class of bug
fixed at sampled_loop.py:115-122 — GSPMD padding of grad-carrying row
dims — shows up exactly at non-divisible shard counts and bigger
meshes).

Usage: mesh_scale_check.py N_DEVICES DATA_AX MODEL_AX
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_devices, data_ax, model_ax = (int(x) for x in sys.argv[1:4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.local_device_count() >= n_devices, (
        f"{jax.local_device_count()} devices visible, need {n_devices}; "
        "launch with XLA_FLAGS=--xla_force_host_platform_device_count")

    from __graft_entry__ import _make_trainer
    from stargcn_tpu.parallel import make_mesh

    mesh = make_mesh(data=data_ax, model=model_ax)
    # deliberately NOT divisible by the model axis (nor by 8):
    nodes = 8 * max(model_ax, 2) + 5
    assert model_ax <= 1 or nodes % model_ax, "want non-divisible nodes"
    trainer = _make_trainer(mesh=mesh, num_users=nodes, num_items=nodes + 2,
                            num_edges=8 * nodes, batch=8 * data_ax)
    batch = next(trainer.data_iter.rating_sampler(
        trainer.train_batch, "train"))
    noise, _, all_ids = next(
        trainer.data_iter.recon_nodes_sampler(batch_size=10 ** 6))
    recon = trainer.prepare_recon_batch(noise, all_ids)
    loss = float(trainer.train_iteration(batch, recon)["loss"])
    assert np.isfinite(loss), f"full-graph loss not finite: {loss}"

    trainer.s.device_sampler = True
    dev_loss = float(np.asarray(trainer.train_chunk_dev(2)["loss"])[-1])
    assert np.isfinite(dev_loss), f"devsampler loss not finite: {dev_loss}"

    # sampled (beyond-HBM) mode on the same mesh
    from stargcn_tpu.train import build_model_config
    from stargcn_tpu.train.loop import TrainSettings
    from stargcn_tpu.train.sampled_loop import SampledTrainer
    from stargcn_tpu.utils import default_cfg

    it = trainer.data_iter
    csr = it.all_graph["user", "movie"]
    cfg = default_cfg()
    cfg.EMBED.UNITS = 8
    cfg.GCN.AGG.UNITS = [15]
    cfg.GCN.OUT.UNITS = [10]
    cfg.GCN.DROPOUT = 0.0
    cfg.GEN_RATING.MID_MAP = 8
    cfg.TRAIN.RATING_BATCH_SIZE = 8 * data_ax
    model_cfg = build_model_config(cfg, csr.shape[0], csr.shape[1],
                                   len(csr.multi_link))
    st = SampledTrainer(model_cfg, it, TrainSettings.from_cfg(cfg),
                        fanout=4, mesh=mesh)
    rs = it.rating_sampler(batch_size=st.train_batch, segment="train")
    rc = it.recon_nodes_sampler(batch_size=st.s.recon_batch_size)
    s_loss = float(st.train_iteration(st._build_batch_safe(rs, rc))["loss"])
    assert np.isfinite(s_loss), f"sampled loss not finite: {s_loss}"

    hlo_line = "skipped (model_ax == 1)"
    if model_ax > 1:
        from stargcn_tpu.parallel.perfmodel import (hlo_collectives,
                                                    modeled_collectives,
                                                    step_hlo_text)

        hlo = hlo_collectives(step_hlo_text(trainer, batch, recon))
        vol = modeled_collectives(trainer.model_cfg, data_ax, model_ax,
                                  backend=trainer.model_cfg.backend)
        assert hlo.get("all-reduce", {}).get("count", 0) > 0, hlo
        modeled = (vol["model_allgather_bytes"]
                   + vol["model_allreduce_bytes"]
                   + vol["data_allreduce_bytes"])
        actual = hlo["total"]["bytes"]
        assert actual / 16 < modeled < actual * 16, (modeled, actual)
        hlo_line = (f"hlo bytes {actual} vs modeled {modeled} "
                    f"({hlo['total']['count']} collectives)")

    print(f"MESH SCALE OK {n_devices}dev {data_ax}x{model_ax} "
          f"nodes={nodes} loss={loss:.4f} dev={dev_loss:.4f} "
          f"sampled={s_loss:.4f} | {hlo_line}")


if __name__ == "__main__":
    main()

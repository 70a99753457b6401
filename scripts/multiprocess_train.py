#!/usr/bin/env python
"""Two-process distributed training demo (multi-host bring-up).

Exercises the full multi-process leg of the parallel design on CPU
devices — the same code path a TPU pod slice uses
(``jax.distributed.initialize`` + a ('data','model') mesh + GSPMD
collectives, here over Gloo):

* 2 processes x 2 local CPU devices = a 2x2 global mesh where the
  'data' axis spans PROCESSES (DP gradient psum crosses hosts);
* every host computes identical batches (same seeds) and contributes
  its addressable shards (``parallel.shardings.place``);
* a checkpoint of cross-process-sharded params is saved (assembled via
  ``process_allgather``), restored, and verified.

Run with no arguments: spawns both ranks and reports the result::

    python scripts/multiprocess_train.py

The reference has no distributed layer at all (SURVEY.md §2.3); this is
new TPU-native design.
"""

import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_rank(rank: int, coordinator: str, workdir: str):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    import numpy as np

    from stargcn_tpu.data.iterators import DataIterator
    from stargcn_tpu.data.synthetic import synthetic_graph
    from stargcn_tpu.models.stargcn import STARGCNConfig
    from stargcn_tpu.parallel import make_mesh
    from stargcn_tpu.train.loop import Trainer, TrainSettings

    g = synthetic_graph(num_users=24, num_items=16, num_edges=256, seed=11)
    csr = g["user", "movie"]
    pairs = csr.node_pair_ids
    rng = np.random.RandomState(0)
    perm = rng.permutation(pairs.shape[1])
    it = DataIterator(g, "user", "movie",
                      test_node_pairs=pairs[:, perm[:40]],
                      valid_node_pairs=pairs[:, perm[40:80]],
                      embed_P_mask=0.2, seed=0,
                      embed_p_zero=1.0, embed_p_self=0.0)
    cfg = STARGCNConfig(
        num_users=24, num_items=16, num_links=len(csr.multi_link),
        nblocks=2, use_dae=True, embed_units=4, agg_units=(10,),
        out_units=(6,), agg_accum="sum", gcn_dropout=0.0,
        gen_rating_mid_map=4)
    s = TrainSettings(rating_batch_size=32, max_iter=4, log_interval=2,
                      valid_interval=2, lr=1e-2, seed=0)
    mesh = make_mesh(data=2, model=2)
    trainer = Trainer(cfg, it, s, mesh=mesh, save_dir=workdir)

    rs = it.rating_sampler(batch_size=trainer.train_batch, segment="train")
    recon = it.recon_nodes_sampler(batch_size=s.recon_batch_size)
    losses = []
    for _ in range(3):
        noise_dict, _, all_ids = next(recon)
        cb = trainer.prepare_recon_batch(noise_dict, all_ids)
        stats = trainer.train_iteration(next(rs), cb)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses)), losses
    rmse = trainer.evaluate("valid")
    assert np.isfinite(rmse).all()

    # checkpoint round-trip of cross-process-sharded state
    path = trainer.save_checkpoint("mp")
    before = jax.device_get(
        jax.tree.map(lambda x: x, trainer.params))
    trainer.restore_checkpoint(path)
    after = jax.device_get(trainer.params)
    import jax.numpy as jnp
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    print(f"rank {rank}: losses={losses} valid_rmse={rmse.tolist()}",
          flush=True)

    # Sampled mode across processes — BASELINE.json north-star config 5
    # ("multi-host row-sharded tables, all-to-all neighbor exchange"):
    # the DP axis of the packed feed spans PROCESSES, the tables
    # row-shard over 'model', and every rank builds identical plans
    # (same seeds).
    from stargcn_tpu.train.sampled_loop import SampledTrainer

    st = SampledTrainer(cfg, it, s, fanout=3, mesh=mesh)
    srs = it.rating_sampler(batch_size=st.train_batch, segment="train")
    srecon = it.recon_nodes_sampler(batch_size=s.recon_batch_size)
    s_losses = []
    for _ in range(3):
        stats = st.train_iteration(st._make_batch(srs, srecon))
        s_losses.append(float(stats["loss"]))
    assert all(np.isfinite(s_losses)), s_losses
    s_rmse = st.evaluate("valid")
    assert np.isfinite(s_rmse).all()
    print(f"rank {rank}: sampled losses={s_losses} "
          f"valid_rmse={s_rmse.tolist()}", flush=True)
    print(f"rank {rank}: MULTIPROCESS OK", flush=True)


def main():
    if "--rank" in sys.argv:
        i = sys.argv.index("--rank")
        rank = int(sys.argv[i + 1])
        coordinator = sys.argv[sys.argv.index("--coordinator") + 1]
        workdir = sys.argv[sys.argv.index("--workdir") + 1]
        run_rank(rank, coordinator, workdir)
        return

    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    workdir = tempfile.mkdtemp(prefix="stargcn_mp_")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(r),
             "--coordinator", coordinator, "--workdir", workdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    ok = all(p.returncode == 0 for p in procs) and all(
        "MULTIPROCESS OK" in o for o in outs)
    for r, o in enumerate(outs):
        print(f"--- rank {r} ---\n{o}")
    if not ok:
        sys.exit("multiprocess run FAILED")
    print("MULTIPROCESS RUN PASSED (2 processes x 2 devices, 2x2 mesh)")


if __name__ == "__main__":
    main()

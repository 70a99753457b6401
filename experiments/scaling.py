#!/usr/bin/env python
"""Scaling harness: training-step throughput across mesh configurations.

Measures examples/s (rating pairs) and edge-messages/s of the sharded
training step for a list of (data, model) mesh shapes — the
1-chip / 1-host / N-hosts scaling measurement called for by
BASELINE.json.  On a multi-chip host it uses the real devices; with
``--virtual N`` it forces N virtual CPU devices (functional validation
of the sharded path, not a performance number).

    python experiments/scaling.py --meshes 1x1,2x1,2x4 --virtual 8
    python experiments/scaling.py --meshes 1x1,1x2,1x4   # on real chips
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--meshes", default="1x1",
                        help="comma list of DATAxMODEL shapes")
    parser.add_argument("--virtual", type=int, default=None,
                        help="force N virtual CPU devices")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--num_users", type=int, default=1024)
    parser.add_argument("--num_items", type=int, default=1024)
    parser.add_argument("--num_edges", type=int, default=100_000)
    parser.add_argument("--batch", type=int, default=8192)
    args = parser.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.virtual}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from __graft_entry__ import _make_trainer
    from stargcn_tpu.parallel import make_mesh

    results = []
    for shape in args.meshes.split(","):
        d, m = (int(x) for x in shape.lower().split("x"))
        mesh = None if d * m == 1 else make_mesh(data=d, model=m)
        trainer = _make_trainer(
            mesh=mesh, num_users=args.num_users, num_items=args.num_items,
            num_edges=args.num_edges, batch=args.batch)
        batch = next(trainer.data_iter.rating_sampler(
            trainer.train_batch, "train"))
        noise, _, ids = next(
            trainer.data_iter.recon_nodes_sampler(batch_size=10**6))
        recon = trainer.prepare_recon_batch(noise, ids)
        stats = trainer.train_iteration(batch, recon)
        jax.block_until_ready(stats["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            stats = trainer.train_iteration(batch, recon)
        jax.block_until_ready(stats["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        cfgm = trainer.model_cfg
        E = int(trainer.graph_data.num_edges_padded)
        edges_per_step = cfgm.nblocks * len(cfgm.agg_units) * 2 * E
        row = {"mesh": f"{d}x{m}", "step_ms": round(dt * 1e3, 3),
               "examples_per_s": round(trainer.train_batch / dt, 1),
               "edge_msgs_per_s": round(edges_per_step / dt, 1)}
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()

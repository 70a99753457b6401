#!/usr/bin/env python
"""Scaling harness: training-step throughput across mesh configurations.

Measures examples/s (rating pairs) and edge-messages/s of the sharded
training step for a list of (data, model) mesh shapes — the
1-chip / 1-host / N-hosts scaling measurement called for by
BASELINE.json.  On a multi-chip host it uses the real devices; with
``--virtual N`` it forces N virtual CPU devices (functional validation
of the sharded path, not a performance number).

Each mesh row also reports the ANALYTICAL collective model
(``parallel/perfmodel.py``): the per-step psum/all-gather byte volumes
the sharding layout implies, next to the collective ops ACTUALLY found
in the compiled HLO — so the model is validated against what XLA
inserted even without a pod.  ``--project`` prints the N-chip
examples/s projection table from a measured single-chip step time.

    python experiments/scaling.py --meshes 1x1,2x1,2x4 --virtual 8
    python experiments/scaling.py --meshes 1x1,1x2,1x4   # on real chips
    python experiments/scaling.py --project --step-ms 152 --batch 100000
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
    parser.add_argument("--project", action="store_true",
                        help="print the analytical N-chip projection "
                             "table (no execution)")
    parser.add_argument("--step-ms", type=float, default=152.0,
                        help="measured 1-chip step ms the projection "
                             "scales from (default: ML-10M bitdense "
                             "sustained fit(), BASELINE.md)")
    args = parser.parse_args()

    if args.project:
        return project_table(args)

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

        # analytical collective model vs the compiled HLO's actual ops
        from stargcn_tpu.parallel.perfmodel import (hlo_collectives,
                                                    modeled_collectives,
                                                    step_hlo_text)
        vol = modeled_collectives(cfgm, d, m, backend=cfgm.backend)
        row["modeled_collective_MB"] = {
            k: round(vol[k] / 1e6, 3) for k in
            ("model_allgather_bytes", "model_allreduce_bytes",
             "data_allreduce_bytes")}
        try:
            hlo = hlo_collectives(step_hlo_text(trainer, batch, recon))
            row["hlo_collectives"] = {
                k: {"count": v["count"], "MB": round(v["bytes"] / 1e6, 3)}
                for k, v in hlo.items()}
        except Exception as e:  # pragma: no cover - depends on backend
            row["hlo_collectives"] = {"error": str(e)}
        results.append(row)
        print(json.dumps(row))
    return results


def project_table(args):
    """Analytical 1/8/32-chip examples/s projection (perfmodel.project)
    from a measured single-chip step time — the falsifiable prediction
    a future pod run checks (no multi-chip hardware here)."""
    from stargcn_tpu.parallel.perfmodel import project
    from stargcn_tpu.train import build_model_config
    from stargcn_tpu.utils.config import default_cfg

    cfg = default_cfg()
    cfg.EMBED.UNITS = 64
    # default dims = ML-10M (what the default --step-ms was measured on)
    nu = args.num_users if args.num_users != 1024 else 69_878
    ni = args.num_items if args.num_items != 1024 else 10_677
    ne = args.num_edges if args.num_edges != 100_000 else 10_000_000
    model_cfg = build_model_config(cfg, nu, ni, 10, num_edges=ne)
    rows = project(model_cfg, step_s_1chip=args.step_ms * 1e-3,
                   batch=args.batch,
                   meshes=((1, 1), (1, 8), (8, 1), (2, 4), (4, 8)))
    for row in rows:
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    main()

"""Analytical scaling model for the sharded full-graph training step.

No multi-chip hardware exists in this environment (the driver validates
the sharded program on a virtual CPU mesh, where absolute times are
meaningless — BASELINE.md "Mesh scaling"), so the examples/s-scaling
target needs a falsifiable prediction instead of a measurement.  This
module supplies it in three parts:

1. ``modeled_collectives`` — per-step collective byte volumes implied by
   the GSPMD layout in ``parallel/shardings.py`` (DP gradient
   all-reduce over 'data'; feature all-gather + partial-sum psum over
   'model' for the edge-set/bit-row sharding), stated per mesh shape.
2. ``hlo_collectives`` — the ACTUAL collective ops (kind, count, bytes
   summed from operand shapes) parsed out of the compiled HLO of the
   real sharded step, so the model is checked against what XLA in fact
   inserted (tests/test_perfmodel.py; ``experiments/scaling.py`` prints
   both side by side).
3. ``project`` — examples/s at N chips from the measured single-chip
   step time: compute scales with the axis that shards it, collective
   time = modeled bytes over ICI ring bandwidth, overlapped terms
   max()-ed.  The projection is the claim a future pod run falsifies.

Chip constants are TPU v5e public numbers (the chip the measured
baselines come from); ICI is modeled as a ring per mesh axis — the
cost of a ring all-reduce of B bytes over n chips is 2*B*(n-1)/n
through each chip's link pair, an all-gather half that (the standard
collective cost model; see e.g. jax-ml.github.io/scaling-book).

The reference has no distributed layer at all (SURVEY.md §2.3); this
model covers the capability the TPU rebuild adds on top of it.
"""

from __future__ import annotations

import re

import numpy as np

# ---- TPU v5e machine model (public numbers) -------------------------------
PEAK_BF16_FLOPS = 197e12
HBM_BYTES_PER_S = 819e9
# One-way ICI bandwidth per link; v5e has a 2D torus (2 link pairs per
# axis).  Ring collectives use both directions of one axis: 2 links.
ICI_BYTES_PER_S_PER_LINK = 45e9
ICI_AXIS_BW = 2 * ICI_BYTES_PER_S_PER_LINK

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*"          # result name
    r"(\([^)]*\)|\S+)\s+"                          # result shape (or tuple)
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
    r"collective-permute)\b",
    re.MULTILINE)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (``f32[8,16]`` or a tuple)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def hlo_collectives(hlo_text: str) -> dict:
    """Count collective ops in compiled HLO and sum their result bytes.

    Returns ``{kind: {"count": int, "bytes": int}}`` plus a ``"total"``
    entry.  ``bytes`` is the RESULT size — for all-reduce that equals
    the reduced tensor, for all-gather the gathered (full) tensor —
    matching how the analytical model states its volumes.
    """
    out = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        shape, kind = m.group(1), m.group(2)
        e = out.setdefault(kind, {"count": 0, "bytes": 0})
        e["count"] += 1
        e["bytes"] += _shape_bytes(shape)
    total = {"count": sum(e["count"] for e in out.values()),
             "bytes": sum(e["bytes"] for e in out.values())}
    out["total"] = total
    return out


def step_hlo_text(trainer, rating_batch, recon_batch) -> str:
    """Compiled HLO of the trainer's real jitted train step (post-GSPMD:
    the collectives XLA inserted are visible)."""
    import jax

    host = trainer._prep_host_arrays(rating_batch, recon_batch)
    ints_d, flts_d, noise_d, rmask_d = trainer._place_step_inputs(*host)
    low = trainer._train_step.lower(
        trainer.params, trainer.opt_state, trainer.graph_data,
        trainer.edge_masks["train"], trainer._train_dense_adj(),
        trainer._train_variant_degrees(), trainer._ell_pack("train"),
        ints_d, flts_d, noise_d, rmask_d, jax.random.PRNGKey(0))
    return low.compile().as_text()


def param_bytes(model_cfg, sharded_embed: bool, m: int) -> dict:
    """fp32 parameter bytes, split into the 'model'-row-sharded
    embedding tables vs everything else (replicated)."""
    cfg = model_cfg
    n = cfg.num_users + cfg.num_items
    embed_b = n * cfg.embed_units * 4 if cfg.use_embed else 0
    levels, L = cfg.num_links, len(cfg.agg_units)
    agg, out, embed = cfg.agg_units[-1], cfg.out_units[-1], cfg.embed_units
    dense = cfg.nblocks * 2 * (
        levels * L * (embed * agg + agg)       # per-level aggregator FCs
        + L * (agg * out + out)                # out FCs
        + out * cfg.gen_rating_mid_map)        # rating head
    if cfg.use_dae:
        dense += cfg.nblocks * 2 * (out * embed + embed)  # recon decoders
    repl_b = dense * 4
    if sharded_embed and m > 1:
        return {"embed_sharded": embed_b, "replicated": repl_b}
    return {"embed_sharded": 0, "replicated": repl_b + embed_b}


def modeled_collectives(model_cfg, d: int, m: int,
                        backend: str = "dense") -> dict:
    """Per-step collective byte volumes implied by the layout in
    ``parallel/shardings.py`` for a ``(data=d, model=m)`` mesh.

    Volumes are stated as the tensor size being reduced/gathered (the
    same convention ``hlo_collectives`` reports); ring transfer cost is
    applied later in ``ici_seconds``.
    """
    cfg = model_cfg
    n = cfg.num_users + cfg.num_items
    feat_b = n * cfg.embed_units * 4
    L = len(cfg.agg_units)
    pb = param_bytes(cfg, sharded_embed=True, m=m)

    model_ag = model_ar = data_ar = 0
    if m > 1:
        # forward: every chip needs all source-feature rows (bit-row /
        # edge shards touch arbitrary sources) -> all-gather of the
        # masked embedding matrix, once per block (encoder input).
        model_ag += cfg.nblocks * feat_b
        # partial-sum combine of the sharded aggregation: forward psum
        # for edge-sharded backends, backward dX psum for bit-row
        # sharding — either way ~one (N, embed) reduction per
        # (block, layer, direction) pair.
        model_ar += cfg.nblocks * L * 2 * feat_b
        # replicated params' grads also reduce over 'model'
        model_ar += pb["replicated"]
    if d > 1:
        # DP gradient all-reduce: replicated params in full, sharded
        # embedding rows at 1/m each.
        data_ar += pb["replicated"] + pb["embed_sharded"] // max(m, 1)
    return {"model_allgather_bytes": model_ag,
            "model_allreduce_bytes": model_ar,
            "data_allreduce_bytes": data_ar,
            "param_bytes": pb}


def ici_seconds(vol: dict, d: int, m: int) -> float:
    """Ring-collective ICI time of the modeled volumes: all-reduce of B
    over n chips moves 2*B*(n-1)/n through each chip's axis links;
    all-gather half that."""

    def ring(b, n, factor):
        return factor * b * (n - 1) / n / ICI_AXIS_BW if n > 1 else 0.0

    return (ring(vol["model_allgather_bytes"], m, 1.0)
            + ring(vol["model_allreduce_bytes"], m, 2.0)
            + ring(vol["data_allreduce_bytes"], d, 2.0))


def project(model_cfg, *, step_s_1chip: float, batch: int,
            agg_fraction: float = 0.85, meshes=((1, 1), (1, 8), (4, 8)),
            backend: str = "dense") -> list:
    """examples/s projection per mesh from the measured 1-chip step.

    ``agg_fraction``: share of the 1-chip step that is the aggregation
    tier (scales 1/m under edge-set sharding); the rest is batch-side
    work (scales 1/d — the GLOBAL batch stays fixed and shards over
    'data', the framework's DP convention).  Collective time adds on
    top (worst case: no compute overlap).
    """
    rows = []
    t_agg = step_s_1chip * agg_fraction
    t_rest = step_s_1chip - t_agg
    for d, m in meshes:
        vol = modeled_collectives(model_cfg, d, m, backend)
        t_ici = ici_seconds(vol, d, m)
        t = t_agg / m + t_rest / max(d, 1) + t_ici
        rows.append({
            "mesh": f"{d}x{m}", "chips": d * m,
            "step_ms": round(t * 1e3, 2),
            "ici_ms": round(t_ici * 1e3, 3),
            "model_allgather_MB": round(
                vol["model_allgather_bytes"] / 1e6, 2),
            "model_allreduce_MB": round(
                vol["model_allreduce_bytes"] / 1e6, 2),
            "data_allreduce_MB": round(
                vol["data_allreduce_bytes"] / 1e6, 2),
            "examples_per_s": round(batch / t, 1),
            "scaling_efficiency": round(
                step_s_1chip / (t * d * m), 3),
        })
    return rows

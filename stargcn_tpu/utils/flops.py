"""Algorithmic (useful) FLOP accounting for MFU reporting.

``bench.py`` divides measured rates by these counts to report MFU =
useful FLOPs/s / chip peak, so that edge-messages/s can never be
mistaken for hardware efficiency (the dense-MXU backend burns ~75x the
useful FLOPs in padding; the useful count here is backend-independent
by design — it is the work the ALGORITHM requires, not what a backend
spends).

Conventions: 1 multiply-add = 2 FLOPs; forward counted explicitly; a
full training step (forward + backward + optimizer) is taken as 3x
forward (backward re-does each matmul twice: data-grad + weight-grad;
optimizer FLOPs are negligible).  Gathers/scatters/reshapes count 0.

Useful forward work of one STAR-GCN step (models/stargcn.py; reference
equations at mxgraph/layers/aggregators.py:111-161):

- aggregation: every edge message multiply-adds one raw ``embed_units``
  row (the linear-equivalent raw-aggregate-then-project formulation;
  the reference projects first, which costs MORE — we count the
  cheaper algorithmic minimum): ``2 * msgs * embed_units``
- per-level projection: each destination row is projected once per
  rating level per aggregation layer: ``nblocks * levels * layers *
  2 * (Nu+Ni) * embed * agg``
- out layer: ``nblocks * 2 * (Nu+Ni) * agg_eff * out`` where
  ``agg_eff = agg`` (sum accum) or ``levels*agg`` (stack)
- gen_rating decoder: both endpoints of each batch pair through
  ``out -> mid`` plus the inner product
- reconstruction decoders (USE_DAE): ``out -> embed`` per node type
"""

from __future__ import annotations

V5E_PEAK_FLOPS = 197e12  # TPU v5e (v5 lite) bf16 peak; MFU denominator


def stargcn_step_flops(model_cfg, e_active: int,
                       rating_batch: int) -> dict:
    """Useful FLOPs for one full-graph training step.

    ``e_active`` = edges actually aggregated (after per-batch removal);
    ``rating_batch`` = rating pairs scored by the decoder.
    """
    nb = model_cfg.nblocks
    levels = model_cfg.num_links
    layers = len(model_cfg.agg_units)
    n = model_cfg.num_users + model_cfg.num_items
    embed = model_cfg.embed_units
    agg = model_cfg.agg_units[-1]
    out = model_cfg.out_units[-1]
    mid = model_cfg.gen_rating_mid_map

    msgs = nb * layers * 2 * e_active
    f_agg = 2 * msgs * embed
    f_proj = nb * levels * layers * 2 * n * embed * agg
    agg_eff = agg * (levels if model_cfg.agg_accum == "stack" else 1)
    f_out = nb * 2 * n * agg_eff * out
    f_dec = nb * (2 * rating_batch * 2 * out * mid + 2 * rating_batch * mid)
    f_rec = (nb * 2 * n * out * embed) if model_cfg.use_dae else 0
    fwd = f_agg + f_proj + f_out + f_dec + f_rec
    return {"fwd": fwd, "step": 3 * fwd, "edge_msgs": msgs}


def mfu(flops_per_step: float, step_seconds: float,
        peak: float = V5E_PEAK_FLOPS) -> float:
    """Model FLOPs utilisation vs chip peak."""
    if not step_seconds:
        return 0.0
    return flops_per_step / step_seconds / peak

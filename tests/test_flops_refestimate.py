"""Unit tests for the MFU accounting (utils/flops.py) and the
reference full-step estimator (utils/refestimate.py)."""

import numpy as np

from stargcn_tpu.train import build_model_config
from stargcn_tpu.utils import default_cfg
from stargcn_tpu.utils.flops import mfu, stargcn_step_flops
from stargcn_tpu.utils.refestimate import (DATASETS, estimate,
                                           estimate_all, measure_host_ms,
                                           op_count)


def _cfg(**over):
    cfg = default_cfg()
    cfg.EMBED.UNITS = 8
    cfg.GCN.AGG.UNITS = [12]
    cfg.GCN.OUT.UNITS = [6]
    cfg.GEN_RATING.MID_MAP = 4
    for k, v in over.items():
        parts = k.split(".")
        node = cfg
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return build_model_config(cfg, 40, 30, 5, num_edges=300)


def test_flops_hand_count():
    m = _cfg()
    f = stargcn_step_flops(m, e_active=100, rating_batch=16)
    # edge messages: nblocks * layers * 2 dirs * E
    assert f["edge_msgs"] == 2 * 1 * 2 * 100
    n, embed, agg, out, mid = 70, 8, 12, 6, 4
    expect_fwd = (2 * f["edge_msgs"] * embed                  # aggregation
                  + 2 * 5 * 1 * 2 * n * embed * agg           # projections
                  + 2 * 2 * n * (5 * agg) * out               # out (stack)
                  + 2 * (2 * 16 * 2 * out * mid + 2 * 16 * mid)  # decoder
                  + 2 * 2 * n * out * embed)                  # recon
    assert f["fwd"] == expect_fwd
    assert f["step"] == 3 * f["fwd"]


def test_flops_accum_sum_vs_stack():
    f_stack = stargcn_step_flops(_cfg(), 100, 16)
    m_sum = _cfg(**{"GCN.AGG.ACCUM": "sum"})
    f_sum = stargcn_step_flops(m_sum, 100, 16)
    assert f_sum["fwd"] < f_stack["fwd"]  # stack widens the out layer


def test_mfu_basics():
    assert mfu(197e12, 1.0) == 1.0 / 1.0 * 197e12 / 197e12
    assert mfu(1e12, 0.0) == 0.0
    assert 0 < mfu(1e12, 1.0) < 0.01


def test_estimate_terms_and_favorability():
    """The bound must be strictly faster (higher rate) than the
    realistic estimate, and the step must be at least the credited host
    time — the 'every term in the reference's favor' contract."""
    for name, shapes in DATASETS.items():
        est = estimate(shapes, host_ms_measured=50.0)
        assert est["rate_bound"] > est["rate_realistic"] > 0
        assert est["step_ms_bound"] >= est["host_ms_credited"]
        assert est["step_ms_bound"] <= est["step_ms_realistic"]
        # device bound decomposes into its printed terms
        assert abs(est["device_ms_bound"]
                   - (est["gather_ms_bound"] + est["gemm_ms"]
                      + est["adam_ms"])) < 0.02
        assert est["edge_msgs_per_step"] > 0


def test_op_count_scales_with_levels():
    assert op_count(10)["total"] > op_count(5)["total"]
    assert op_count(5)["bwd"] == 2 * op_count(5)["fwd"]


def test_estimate_all_recorded_fallback():
    out = estimate_all(measure=False)
    assert set(out) == set(DATASETS)
    # sanity band: the reference full step can't beat its own
    # kernel-only roofline (720 M msgs/s) nor fall below 0.1 M
    for est in out.values():
        assert 1e5 < est["rate_bound"] < 7.2e8


def test_measure_host_ms_runs_small():
    shapes = dict(nu=50, ni=40, ratings=2000, levels=5, embed=8,
                  batch=256)
    got = measure_host_ms(shapes, iters=2)
    assert got["host_ms_measured"] > 0

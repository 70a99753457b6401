"""TPU-native segment operators and graph aggregation kernels.

API parity with the reference MXNet custom operators registered in
``seg_ops_cuda/mxnet_op/seg_op.cc:339-861`` (``seg_sum``, ``seg_max``,
``seg_min``, ``seg_broadcast_add/mul/to``, ``seg_softmax``,
``seg_take_k_corr``, ``seg_weighted_pool``, ``seg_pool``), re-designed as
XLA segment reductions / Pallas TPU kernels instead of hand-written CUDA.
"""

from stargcn_tpu.ops.segment import (
    indptr_to_segment_ids,
    seg_broadcast_add,
    seg_broadcast_mul,
    seg_broadcast_to,
    seg_max,
    seg_min,
    seg_pool,
    seg_softmax,
    seg_sum,
    seg_take_k_corr,
    seg_weighted_pool,
)
from stargcn_tpu.ops.agg import (
    multi_link_aggregate,
    gather_weighted_segment_sum,
)

__all__ = [
    "indptr_to_segment_ids",
    "seg_sum",
    "seg_max",
    "seg_min",
    "seg_broadcast_add",
    "seg_broadcast_mul",
    "seg_broadcast_to",
    "seg_softmax",
    "seg_take_k_corr",
    "seg_weighted_pool",
    "seg_pool",
    "multi_link_aggregate",
    "gather_weighted_segment_sum",
]

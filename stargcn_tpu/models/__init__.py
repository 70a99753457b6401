"""Model layers and the STAR-GCN network (flax.linen, full-graph TPU mode)."""

from stargcn_tpu.models.aggregators import MultiLinkGCNAggregator
from stargcn_tpu.models.layers import (
    HeterGCNLayer,
    InnerProductLayer,
    StackedHeterGCNLayers,
)
from stargcn_tpu.models.stargcn import STARGCN, STARGCNConfig

__all__ = [
    "MultiLinkGCNAggregator",
    "HeterGCNLayer",
    "StackedHeterGCNLayers",
    "InnerProductLayer",
    "STARGCN",
    "STARGCNConfig",
]

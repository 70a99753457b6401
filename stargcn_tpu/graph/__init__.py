"""Host-side graph data structures and the device-side edge-array format.

``CSRMat``/``HeterGraph`` replicate the reference Python graph layer
(``mxgraph/graph.py``) — id-keyed CSR matrices with per-rating multi-link
structure — backed by the native C++ kernels in ``stargcn_tpu/native`` (the
TPU-era ``GraphSampler``).  ``EdgeSet``/``BipartiteGraphData`` are the
TPU-native flat, static-shape device representation the models consume.
"""

from stargcn_tpu.graph.csr import (
    CSRMat,
    NodeFeatures,
    merge_node_ids_dict,
    merge_nodes,
)
from stargcn_tpu.graph.hetero import HeterGraph
from stargcn_tpu.graph.device import BipartiteGraphData

__all__ = [
    "CSRMat",
    "NodeFeatures",
    "HeterGraph",
    "BipartiteGraphData",
    "merge_nodes",
    "merge_node_ids_dict",
]

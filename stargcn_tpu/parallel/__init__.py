"""Multi-chip parallelism: device meshes and sharding layouts."""

from stargcn_tpu.parallel.mesh import make_mesh
from stargcn_tpu.parallel.shardings import GraphShardings

__all__ = ["make_mesh", "GraphShardings"]

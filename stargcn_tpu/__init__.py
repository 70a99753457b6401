"""stargcn_tpu — a TPU-native (JAX/XLA/Pallas) STAR-GCN framework.

A from-scratch re-design of the capabilities of jennyzhang0215/STAR-GCN
(IJCAI 2019) for TPU hardware:

* the per-rating-level graph convolution (reference: custom CUDA ``seg_ops``
  under ``seg_ops_cuda/``) is implemented as XLA segment reductions and
  Pallas TPU kernels over static-shape edge arrays (``stargcn_tpu.ops``);
* the host-side graph library (reference: C++/OpenMP ``GraphSampler``)
  is a C++ CPython extension plus a NumPy CSR layer (``stargcn_tpu.graph``,
  ``stargcn_tpu/native``);
* training runs full-graph, single compiled XLA program per config —
  the reference's per-iteration host planning (``gen_plan``/``heter_sage``)
  is replaced by static edge masks (``stargcn_tpu.models``,
  ``stargcn_tpu.train``);
* multi-chip scaling uses ``jax.sharding`` meshes: data-parallel batches,
  edge-sharded aggregation with psum combine, and row-sharded embedding
  tables (``stargcn_tpu.parallel``).
"""

__version__ = "0.1.0"

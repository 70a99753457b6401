"""Native C++ host kernels (built from graph_kernels.cpp).

Build in-place with::

    python setup.py build_native

or ``python -m stargcn_tpu.native.build``.  All callers go through
``stargcn_tpu.graph.kernels``, which falls back to NumPy when the
extension is absent.
"""

"""TPU compute kernels: XLA-first formulations (MXU matmuls, fused
elementwise) plus Pallas kernels for the hot paths the compiler can't fuse.

Every op has a host/numpy or torch cross-check test in ``tests/``.
"""

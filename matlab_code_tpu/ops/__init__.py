"""Operator library: tensor kernels, dense linear algebra, proximal operators.

Everything here is jit-compatible, batched, and shaped statically so XLA can
tile matmuls onto the MXU and fuse the elementwise (VPU) work around them.
"""

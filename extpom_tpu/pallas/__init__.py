"""Fused Pallas TPU kernels for hot stencil groups."""

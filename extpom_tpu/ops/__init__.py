"""Numerical kernels (the op library mirroring solver.f)."""

"""Pallas TPU kernels for the hot loops.

* :mod:`extpom_tpu.pallas.extloop` — the whole external-mode substep loop
  (advance.f:205-353 x isplit) as ONE VMEM-resident kernel: the 2-D state
  is read from HBM once, all isplit leapfrog substeps run on-chip, and the
  final carry is written back once.
"""

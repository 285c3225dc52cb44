"""Shifted-slice stencil primitives.

The reference expresses every horizontal stencil as Fortran loops over
partial index ranges with explicit neighbor indexing (e.g. solver.f:20-34).
Here each op is written on *global* arrays using two primitives:

* :func:`sft` — a zero-padded shifted read: ``sft(a, di, dj)[..., i, j] ==
  a[..., i+di, j+dj]`` (0 outside the array).  Fortran ``a(i-1,j)`` inside a
  loop body is ``sft(a, -1, 0)``.
* :func:`put` — region-limited assignment: evaluate a full-shape expression
  but commit it only on the slice region the Fortran loop covered, keeping
  the base array's values elsewhere.

Both lower to pad/slice/dynamic-update-slice, which XLA's SPMD partitioner
turns into edge-strip collective-permutes (the halo exchange) when the i/j
axes are sharded over a device mesh.  This replaces exchange2d/3d_mpi
(parallel_mpi.f:154-351) wholesale.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

Slices = Tuple[Union[slice, type(Ellipsis)], ...]

# Common Fortran loop-bound slices (1-based bound -> 0-based slice).
# e.g. `do i=2,imm1` covers 0-based 1..im-2 -> slice(1, -1).
S_2_M1 = slice(1, -1)    # 2..(n-1)
S_2_N = slice(1, None)   # 2..n
S_1_M1 = slice(0, -1)    # 1..(n-1)
S_1_N = slice(None)      # 1..n
S_3_M1 = slice(2, -1)    # 3..(n-1)
S_1_M2 = slice(0, -2)    # 1..(n-2)


def _shift1(a: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Zero-padded shift along one axis: out[i] = a[i+d] (0 outside)."""
    if d == 0:
        return a
    n = a.shape[axis]
    pad = [(0, 0)] * a.ndim
    if d > 0:
        pad[axis] = (0, d)
        return jnp.pad(a, pad)[
            tuple(slice(d, d + n) if ax == axis % a.ndim else slice(None)
                  for ax in range(a.ndim))
        ]
    else:
        pad[axis] = (-d, 0)
        return jnp.pad(a, pad)[
            tuple(slice(0, n) if ax == axis % a.ndim else slice(None)
                  for ax in range(a.ndim))
        ]


def sft(a: jnp.ndarray, di: int = 0, dj: int = 0) -> jnp.ndarray:
    """Horizontal shifted read: ``out[..., i, j] = a[..., i+di, j+dj]``.

    Out-of-range reads yield 0, matching the reference's pattern of
    zero-initialized scratch arrays combined with partial loop ranges.
    The i axis is ``-2``, the j axis is ``-1``.
    """
    out = a
    if di:
        out = _shift1(out, di, -2)
    if dj:
        out = _shift1(out, dj, -1)
    return out


def sfk(a: jnp.ndarray, dk: int) -> jnp.ndarray:
    """Vertical shifted read along leading k axis: out[k] = a[k+dk]."""
    return _shift1(a, dk, 0)


def put(base: jnp.ndarray, expr: jnp.ndarray, *region) -> jnp.ndarray:
    """Commit ``expr`` onto ``base`` over ``region`` (tuple of slices).

    ``region`` is given for the *trailing* dimensions; leading dimensions
    (e.g. k for 3-D fields where the Fortran loop covers all k in range)
    may be included explicitly or via ``slice(None)``.
    """
    idx = (Ellipsis,) + tuple(region)
    return base.at[idx].set(expr[idx])


def zeros_like(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.zeros_like(a)

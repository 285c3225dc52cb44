"""Shifted-slice stencil primitives (SPMD-sound, branch-free).

The reference expresses every horizontal stencil as Fortran loops over
partial index ranges with explicit neighbor indexing (e.g. solver.f:20-34).
Here each op is written on *global* arrays using two primitives:

* :func:`sft` — a zero-padded shifted read: ``sft(a, di, dj)[..., i, j] ==
  a[..., i+di, j+dj]`` (0 outside the array).  Fortran ``a(i-1,j)`` inside a
  loop body is ``sft(a, -1, 0)``.
* :func:`put` — region-limited assignment: evaluate a full-shape expression
  but commit it only on the region the Fortran loop covered, keeping the
  base array's values elsewhere.

``put`` (and the :func:`set_i`/:func:`set_j`/:func:`set_k` edge writers) are
implemented as ``jnp.where`` selects over iota masks, NOT as
``array.at[...].set``: masked selects partition trivially and fuse into the
surrounding elementwise work, whereas scatter/dynamic-update-slice regions
that land entirely inside one shard are miscompiled by the XLA SPMD
partitioner in this environment (observed: global edge-row updates zeroing
the first row of every shard).  This replaces the reference's
exchange2d/3d_mpi (parallel_mpi.f:154-351) and its edge-rank conditionals
(n_west.eq.-1 etc.) wholesale: shifts lower to halo collective-permutes,
masks make every rank execute the same program.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

class _RegionBuilder:
    """``s_[KM1, 1:-1, :]`` -> tuple of region entries (always a tuple,
    unlike numpy.s_, so ``put(base, expr, *s_[...])`` works for any arity)."""

    def __getitem__(self, item):
        return item if isinstance(item, tuple) else (item,)


s_ = _RegionBuilder()

# Common Fortran loop-bound slices (1-based bound -> 0-based slice).
# e.g. `do i=2,imm1` covers 0-based 1..im-2 -> slice(1, -1).
S_2_M1 = slice(1, -1)    # 2..(n-1)
S_2_N = slice(1, None)   # 2..n
S_1_M1 = slice(0, -1)    # 1..(n-1)
S_1_N = slice(None)      # 1..n
S_3_M1 = slice(2, -1)    # 3..(n-1)
S_1_M2 = slice(0, -2)    # 1..(n-2)


def _shift1(a: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Zero-padded shift along one axis: out[i] = a[i+d] (0 outside).

    Implemented as slice + concatenate-with-zeros (not jnp.pad) so the same
    expression lowers both through XLA and through Mosaic inside Pallas
    kernels (pallas/extloop.py evaluates whole stencil substeps in VMEM)."""
    if d == 0:
        return a
    ax = axis % a.ndim
    idx = lambda s: tuple(s if i == ax else slice(None)
                          for i in range(a.ndim))
    zshape = list(a.shape)
    zshape[ax] = abs(d)
    zeros = jnp.zeros(zshape, a.dtype)
    if d > 0:
        return jnp.concatenate([a[idx(slice(d, None))], zeros], axis=ax)
    else:
        return jnp.concatenate([zeros, a[idx(slice(0, d))]], axis=ax)


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


def _axis_mask(n: int, r: Union[slice, int]) -> Tuple[int, int]:
    """Resolve a region entry to a half-open [lo, hi) on an axis of size n."""
    if isinstance(r, int):
        lo = r % n
        return lo, lo + 1
    lo, hi, step = r.indices(n)
    assert step == 1, "strided regions unsupported"
    return lo, hi


def region_mask(shape: Tuple[int, ...], region) -> jnp.ndarray:
    """Boolean mask (broadcastable to ``shape``) that is True on ``region``.

    ``region`` entries (int or slice) apply to the LEADING len(region) axes
    of ``shape`` — exactly like ``a[region]`` numpy indexing, so
    ``put(a, e, *s_[R])`` matches ``a.at[R].set(e[R])``.  Built from
    broadcasted iota comparisons so it partitions under SPMD without
    scatter.
    """
    mask = None
    for k, r in enumerate(region):
        ax = k
        n = shape[ax]
        lo, hi = _axis_mask(n, r)
        if lo == 0 and hi == n:
            continue
        ii = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        m = (ii >= lo) & (ii < hi)
        mask = m if mask is None else (mask & m)
    if mask is None:
        return jnp.ones(shape, bool)
    return mask


def put(base: jnp.ndarray, expr: jnp.ndarray, *region) -> jnp.ndarray:
    """Commit ``expr`` onto ``base`` over ``region`` (ints / slices applied
    to the leading ``len(region)`` axes, numpy-style); elsewhere keep
    ``base``."""
    return jnp.where(region_mask(base.shape, region), expr, base)


def set_i(base: jnp.ndarray, i: int, val,
          j=slice(None), k=slice(None)) -> jnp.ndarray:
    """Set row ``i`` (axis -2) to ``val`` (full-width along j, broadcastable
    over leading axes) — the masked-write form of
    ``base.at[..., i, j].set``.  ``j``/``k`` optionally restrict the
    transverse range (k applies to 3-D bases only)."""
    region = (i, j) if base.ndim == 2 else (k, i, j)
    return put(base, _expand(base, val, -2, i), *region)


def set_j(base: jnp.ndarray, j: int, val,
          i=slice(None), k=slice(None)) -> jnp.ndarray:
    """Set column ``j`` (axis -1) to ``val``."""
    region = (i, j) if base.ndim == 2 else (k, i, j)
    return put(base, _expand(base, val, -1, j), *region)


def set_k(base: jnp.ndarray, k: int, val) -> jnp.ndarray:
    """Set level ``k`` (axis 0 of a (kb, ...) array) to ``val``."""
    nd = base.ndim
    region = (k,) + (slice(None),) * (nd - 1)
    return put(base, _expand(base, val, 0, k), *region)


def _expand(base: jnp.ndarray, val, axis: int, idx: int) -> jnp.ndarray:
    """Broadcast a slice-shaped ``val`` back to ``base``'s shape along
    ``axis`` (value is only read on the masked row/col, placement is
    irrelevant elsewhere)."""
    val = jnp.asarray(val, base.dtype)
    if val.ndim == base.ndim:
        return val
    if val.ndim == 0:
        return jnp.broadcast_to(val, base.shape)
    return jnp.broadcast_to(jnp.expand_dims(val, axis), base.shape)


def row(a: jnp.ndarray, i: int) -> jnp.ndarray:
    """``a[..., i, :]`` with a python-int index resolved statically.

    jnp lowers negative-literal indexing through ``dynamic_slice`` (it emits
    a sign-normalization select), which Mosaic cannot lower inside Pallas
    kernels; ``i % n`` resolves the index at trace time instead."""
    return a[..., i % a.shape[-2], :]


def col(a: jnp.ndarray, j: int) -> jnp.ndarray:
    """``a[..., :, j]`` with a static python-int index (see :func:`row`)."""
    return a[..., :, j % a.shape[-1]]


def zeros_like(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.zeros_like(a)

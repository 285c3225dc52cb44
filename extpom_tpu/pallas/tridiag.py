"""Fused Pallas tridiagonal (Thomas) solver for the vertical implicit
solves.

The XLA path expresses each Richtmyer-Morton sweep as a fully-unrolled
k-recurrence (ops.vertical._forward/_backward): ~2 x (kb-1) dependent
elementwise ops per solve, 6 solves per step (T, S, u, v, q2, q2l).  On
the device trace that is hundreds of ~3 us kernels per step — launch-bound
— and the ee/gg elimination stacks are materialized in HBM.

This kernel runs one WHOLE solve (forward elimination + bottom boundary
row + back substitution) in a single Mosaic kernel, blocked over i: the
(kb, Bi, jm) column slab and its ee/gg stacks live in VMEM, HBM traffic is
exactly the operands in + solution out, and the k-recurrence is
straight-line VPU code.

The bottom boundary row is expressed in the closed form shared by every
solver in solver.f:1541-1877/1212-1455:

    f[k_last] = (cl * gg[k_last-1] + rb) / (cl * (1 - ee[k_last-1]) + db)
                * mask

with per-solver 2-D fields (cl, rb, db, mask):

* proft  (solver.f:1664-1671): cl = c[kbm2], rb = -f[kbm2] + rad term,
  db = -1, mask = 1
* profu/profv (solver.f:1750-1761/1847-1858): cl = c[kbm2],
  rb = -f[kbm2], db = tps dti2 / (-dz[kbm2] dh) - 1, mask = dum/dvm
* profq q2 (solver.f:1394-1413): cl = 0, rb = bottom TKE BC, db = 1
* profq q2l (solver.f:1436-1455): cl = 0, rb = 0, db = 1

Back substitution masks every level (the reference's in-loop * dum), which
is equivalent to masking once at the end because the masks are constant
over k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except ImportError:          # pragma: no cover
    _HAVE_PLTPU = False

from extpom_tpu.core.config import Config


def use_pallas_tridiag(cfg: Config) -> bool:
    """Static dispatch; "on" forces (single-device or shard_map local —
    the solve is horizontally pointwise so it runs unchanged on local
    blocks), "auto" resolves to OFF.

    Round-3 measurement: enabling this by default was the r2 bench
    regression (256^2x31 scanned segments: 392 vs 410 Mpt-steps/s with it
    off; 25 vs 63 Mpt-steps/s step-at-a-time at 128^2x21) — the per-solve
    pallas_call + flatten/pad glue costs more than the removed XLA
    slice/copy launches.  The fused phase kernels (pallas/phases.py) now
    absorb the vertical solves on the fast path, so this standalone kernel
    remains only as an explicitly forced option."""
    from extpom_tpu.ops import stencil
    if cfg.pallas_tridiag == "off" or not _HAVE_PLTPU:
        return False
    ctx = stencil._ctx()
    if ctx is not None and ctx.windowed:
        # inside a halo-window phase kernel: no nested pallas_call
        return False
    if cfg.pallas_tridiag == "on":
        return True
    return False


def _kernel(k0: int, k_last: int, kb: int, *refs):
    (a_ref, c_ref, den_ref, rhs_ref, ee0_ref, gg0_ref, cl_ref, rb_ref,
     db_ref, mask_ref, out_ref, ee_scr, gg_scr) = refs

    # seeds; scratch rows below the seed stay zero (read by the final
    # back-substitution rows, which callers mask/overwrite)
    ee = ee0_ref[0]
    gg = gg0_ref[0]
    for k in range(k0 - 1):
        ee_scr[k] = jnp.zeros_like(ee)
        gg_scr[k] = jnp.zeros_like(gg)
    ee_scr[k0 - 1] = ee
    gg_scr[k0 - 1] = gg

    # forward elimination (solver.f:1650-1661 pattern)
    for k in range(k0, k_last):
        g_ = 1.0 / (a_ref[k] + c_ref[k] * (1.0 - ee) - den_ref[k])
        ee = a_ref[k] * g_
        gg = (rhs_ref[k] + c_ref[k] * gg) * g_
        ee_scr[k] = ee
        gg_scr[k] = gg

    # bottom boundary row (closed form, see module docstring)
    mask = mask_ref[0]
    f = ((cl_ref[0] * gg_scr[k_last - 1] + rb_ref[0])
         / (cl_ref[0] * (1.0 - ee_scr[k_last - 1]) + db_ref[0])) * mask
    out_ref[k_last] = f

    # back substitution (solver.f:1673-1680 pattern)
    for k in range(k_last - 1, -1, -1):
        f = (ee_scr[k] * f + gg_scr[k]) * mask
        out_ref[k] = f
    for k in range(k_last + 1, kb):
        out_ref[k] = jnp.zeros_like(f)


def thomas(cfg: Config, a, c, den, rhs, ee0, gg0, cl, rb, db, mask,
           k0: int, k_last: int, interpret: bool = False,
           block_n: int = 8 * 1024):
    """Solve the vertical tridiagonal system fused in VMEM.

    3-D operands are (kb, im, jm); 2-D operands (im, jm).  The solve is
    pointwise in the horizontal, so (i, j) is flattened and blocked in
    lane-aligned chunks of ``block_n`` columns — VMEM use is independent
    of the grid size (7 live fields x kb x block_n x 4 B ~ 7 MB at
    kb=31).  Returns the (kb, im, jm) solution with rows > k_last zeroed
    (callers append their pass-through layers).
    """
    kb, im, jm = a.shape
    dt_ = a.dtype
    n = im * jm
    to2 = lambda x: jnp.broadcast_to(jnp.asarray(x, dt_),
                                     (im, jm)).reshape(1, n)
    a, c, den, rhs = (jnp.asarray(x, dt_).reshape(kb, n)
                      for x in (a, c, den, rhs))
    ee0, gg0, cl, rb, db, mask = (to2(x) for x in
                                  (ee0, gg0, cl, rb, db, mask))

    bn = min(block_n, -(-n // 128) * 128)
    n_p = -(-n // bn) * bn
    if n_p != n:
        pad3 = ((0, 0), (0, n_p - n))
        a, c, den, rhs = (jnp.pad(x, pad3) for x in (a, c, den, rhs))
        ee0, gg0, cl, rb, mask = (jnp.pad(x, pad3) for x in
                                  (ee0, gg0, cl, rb, mask))
        db = jnp.pad(db, pad3, constant_values=1.0)  # keep divisor nonzero

    s3 = pl.BlockSpec((kb, bn), lambda i: (0, i))
    s2 = pl.BlockSpec((1, bn), lambda i: (0, i))
    kernel = functools.partial(_kernel, k0, k_last, kb)
    out = pl.pallas_call(
        kernel,
        grid=(n_p // bn,),
        in_specs=[s3, s3, s3, s3, s2, s2, s2, s2, s2, s2],
        out_specs=s3,
        out_shape=jax.ShapeDtypeStruct((kb, n_p), dt_),
        scratch_shapes=[pltpu.VMEM((kb, bn), dt_),
                        pltpu.VMEM((kb, bn), dt_)],
        interpret=interpret,
    )(a, c, den, rhs, ee0, gg0, cl, rb, db, mask)
    return out[:, :n].reshape(kb, im, jm)

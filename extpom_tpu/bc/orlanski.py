"""Orlanski radiation open boundaries.

Mirrors ``bcondorl(idx)`` (bounds_forcing.f:331-590), the alternative BC set
"specialized for the seamount problem".  The reference's active code uses
these for idx 3 (internal velocity) and 5 (w mask) (advance.f:398,464).

The implicit phase speed is cl = (fb_b - ff_b) / (ff_b + fb_b - 2 f_i),
clamped to [0, 1], evaluated one row inside the boundary.  All edge writes
are branch-free masked selects (SPMD-sound; see ops.stencil).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.ops.stencil import put, set_i, set_j, s_, row, col


def _cl(ff_b, fb_b, f_i):
    denom = ff_b + fb_b - 2.0 * f_i
    denom = jnp.where(denom == 0.0, 0.01, denom)
    return jnp.clip((fb_b - ff_b) / denom, 0.0, 1.0)


def orl_el(grid: Grid, cfg: Config, elf: jnp.ndarray) -> jnp.ndarray:
    """idx=1: elevation, west/east zero-gradient (bounds_forcing.f:342-350).

    Deviation: the reference leaves the north/south rows untouched (they
    stay at the stale scratch value); here they get the same zero-gradient
    so the scheme is usable standalone with four open sides."""
    elf = set_i(elf, 0, elf[1, :])
    elf = set_i(elf, -1, row(elf, -2))
    elf = set_j(elf, 0, elf[:, 1])
    elf = set_j(elf, -1, col(elf, -2))
    return elf * grid.fsm


def orl_vel2d(grid: Grid, cfg: Config,
              uaf: jnp.ndarray, vaf: jnp.ndarray,
              ua: jnp.ndarray, uab: jnp.ndarray,
              va: jnp.ndarray, vab: jnp.ndarray,
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=2: external velocity Orlanski radiation
    (bounds_forcing.f:352-416)."""
    J = slice(1, -1)
    I = slice(1, -1)
    # east (u-face at im-1; phase speed from the face at im-2)
    cl = _cl(row(uaf, -2), row(uab, -2), row(ua, -3))
    uaf = set_i(uaf, -1,
                (row(uab, -1) * (1.0 - cl) + 2.0 * cl * row(ua, -2)) / (1.0 + cl),
                j=J)
    vaf = set_i(vaf, -1, 0.0, j=J)
    # west (u-face at 1)
    cl = _cl(uaf[2, :], uab[2, :], ua[3, :])
    uaf = set_i(uaf, 1,
                (uab[1, :] * (1.0 - cl) + 2.0 * cl * ua[2, :]) / (1.0 + cl),
                j=J)
    uaf = set_i(uaf, 0, uaf[1, :], j=J)
    vaf = set_i(vaf, 0, 0.0, j=J)
    # south
    cl = _cl(vaf[:, 2], vab[:, 2], va[:, 3])
    vaf = set_j(vaf, 1,
                (vab[:, 1] * (1.0 - cl) + 2.0 * cl * va[:, 2]) / (1.0 + cl),
                i=I)
    vaf = set_j(vaf, 0, vaf[:, 1], i=I)
    uaf = set_j(uaf, 0, 0.0, i=I)
    # north
    cl = _cl(col(vaf, -2), col(vab, -2), col(va, -3))
    vaf = set_j(vaf, -1,
                (col(vab, -1) * (1.0 - cl) + 2.0 * cl * col(va, -2)) / (1.0 + cl),
                i=I)
    uaf = set_j(uaf, -1, 0.0, i=I)

    return uaf * grid.dum, vaf * grid.dvm


def orl_vel3d(grid: Grid, cfg: Config,
              uf: jnp.ndarray, vf: jnp.ndarray,
              u: jnp.ndarray, ub: jnp.ndarray,
              v: jnp.ndarray, vb: jnp.ndarray,
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=3: internal velocity Orlanski radiation
    (bounds_forcing.f:418-487)."""
    kbm1 = cfg.kbm1
    K = slice(0, kbm1)
    J = slice(1, -1)
    I = slice(1, -1)
    # east
    cl = _cl(row(uf, -2), row(ub, -2), row(u, -3))
    uf = set_i(uf, -1,
               (row(ub, -1) * (1.0 - cl) + 2.0 * cl * row(u, -2))
               / (1.0 + cl), j=J, k=K)
    vf = set_i(vf, -1, 0.0, j=J, k=K)
    # west
    cl = _cl(uf[:, 2, :], ub[:, 2, :], u[:, 3, :])
    uf = set_i(uf, 1,
               (ub[:, 1, :] * (1.0 - cl) + 2.0 * cl * u[:, 2, :])
               / (1.0 + cl), j=J, k=K)
    uf = set_i(uf, 0, uf[:, 1, :], j=J, k=K)
    vf = set_i(vf, 0, 0.0, j=J, k=K)
    # south
    cl = _cl(vf[:, :, 2], vb[:, :, 2], v[:, :, 3])
    vf = set_j(vf, 1,
               (vb[:, :, 1] * (1.0 - cl) + 2.0 * cl * v[:, :, 2])
               / (1.0 + cl), i=I, k=K)
    vf = set_j(vf, 0, vf[:, :, 1], i=I, k=K)
    uf = set_j(uf, 0, 0.0, i=I, k=K)
    # north
    cl = _cl(col(vf, -2), col(vb, -2), col(v, -3))
    vf = set_j(vf, -1,
               (col(vb, -1) * (1.0 - cl) + 2.0 * cl * col(v, -2))
               / (1.0 + cl), i=I, k=K)
    uf = set_j(uf, -1, 0.0, i=I, k=K)

    uf = put(uf, uf * grid.dum, *s_[K])
    vf = put(vf, vf * grid.dvm, *s_[K])
    return uf, vf


def orl_ts(grid: Grid, cfg: Config,
           uf: jnp.ndarray, vf: jnp.ndarray,
           t: jnp.ndarray, tb: jnp.ndarray,
           s: jnp.ndarray, sb: jnp.ndarray,
           ub: jnp.ndarray, fc) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=4: T/S Orlanski radiation at the east/west boundaries, with
    upstream clamping to the boundary profile when the phase speed vanishes
    and the flow enters the domain (bounds_forcing.f:489-548)."""
    kbm1 = cfg.kbm1
    K = slice(0, kbm1)

    def side_ew(ff, f, fb, edge, inner, inner2, ubc, fb_ext, inflow_ge):
        cl = _cl(ff[:, inner, :], fb[:, inner, :], f[:, inner2, :])
        new = (fb[:, edge, :] * (1.0 - cl)
               + 2.0 * cl * f[:, inner, :]) / (1.0 + cl)
        if inflow_ge:   # west: inflow when ub >= 0
            clamp = (cl == 0.0) & (ubc >= 0.0)
        else:           # east: inflow when ub <= 0
            clamp = (cl == 0.0) & (ubc <= 0.0)
        return jnp.where(clamp, fb_ext, new)

    # east: boundary normal velocity ube := ub(im) (bounds_forcing.f:497)
    ube = row(ub, -1)
    tfe = side_ew(uf, t, tb, -1, -2, -3, ube, fc.tbe, False)
    sfe = side_ew(vf, s, sb, -1, -2, -3, ube, fc.sbe, False)
    uf = set_i(uf, -1, tfe, k=K)
    vf = set_i(vf, -1, sfe, k=K)
    # west: ubw := ub(2) (bounds_forcing.f:519)
    ubw = ub[:, 1, :]
    tfw = side_ew(uf, t, tb, 0, 1, 2, ubw, fc.tbw, True)
    sfw = side_ew(vf, s, sb, 0, 1, 2, ubw, fc.sbw, True)
    uf = set_i(uf, 0, tfw, k=K)
    vf = set_i(vf, 0, sfw, k=K)

    # Deviation: zero-gradient north/south edges (the reference leaves them
    # at stale scratch values; see orl_el).
    uf = set_j(uf, 0, uf[:, :, 1], k=K)
    uf = set_j(uf, -1, col(uf, -2), k=K)
    vf = set_j(vf, 0, vf[:, :, 1], k=K)
    vf = set_j(vf, -1, col(vf, -2), k=K)

    uf = put(uf, uf * grid.fsm, *s_[K])
    vf = put(vf, vf * grid.fsm, *s_[K])
    return uf, vf


def orl_w(grid: Grid, cfg: Config, w: jnp.ndarray) -> jnp.ndarray:
    """idx=5: w mask (bounds_forcing.f:550-561)."""
    return put(w, w * grid.fsm, *s_[:cfg.kbm1])


def orl_turb(grid: Grid, cfg: Config,
             uf: jnp.ndarray, vf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=6: q2/q2l — clamp west/east edges to 1e-10, mask by fsm
    (bounds_forcing.f:563-585)."""
    uf = set_i(set_i(uf, 0, 1.0e-10), -1, 1.0e-10)
    vf = set_i(set_i(vf, 0, 1.0e-10), -1, 1.0e-10)
    return uf * grid.fsm, vf * grid.fsm

"""Open lateral boundary conditions (file-driven set).

Mirrors ``bcond(idx)`` (bounds_forcing.f:6-328).  The reference's
``n_west.eq.-1``-style rank conditionals disappear: on global arrays the
physical edges are simply the first/last rows and columns, and every edge
write is a branch-free masked select (:func:`extpom_tpu.ops.stencil.set_i`
etc.), so under SPMD sharding each shard executes the identical program and
the mask picks out the shard that owns the edge.

Each function is pure: it takes the fields it modifies plus what it reads,
and returns the updated fields.  Side order within each function matches the
reference exactly (corners are decided by whichever side writes last).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.core.state import Forcing
from extpom_tpu.ops.stencil import sfk, put, set_i, set_j, s_, row, col


def bc_el(grid: Grid, cfg: Config, elf: jnp.ndarray,
          fc: Forcing) -> jnp.ndarray:
    """idx=1: external elevation, zero-gradient at open edges
    (bounds_forcing.f:18-41)."""
    elf = set_i(elf, 0, elf[1, :])      # west
    elf = set_i(elf, -1, row(elf, -2))    # east
    elf = set_j(elf, 0, elf[:, 1])      # south
    elf = set_j(elf, -1, col(elf, -2))    # north
    return elf * grid.fsm


def bc_vel2d(grid: Grid, cfg: Config,
             uaf: jnp.ndarray, vaf: jnp.ndarray,
             el: jnp.ndarray, d: jnp.ndarray,
             fc: Forcing, ramp) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=2: external velocity, Flather-type radiation
    (bounds_forcing.f:43-83)."""
    g = cfg.grav
    J = slice(1, -1)
    I = slice(1, -1)
    # west
    uaf = set_i(uaf, 1, ramp * (
        fc.uabw - cfg.rfw * jnp.sqrt(g / d[1, :]) * (el[1, :] - fc.elw)),
        j=J)
    uaf = set_i(uaf, 0, uaf[1, :], j=J)
    vaf = set_i(vaf, 0, fc.vabw, j=J)
    # east
    uaf = set_i(uaf, -1, ramp * (
        fc.uabe + cfg.rfe * jnp.sqrt(g / row(d, -2)) * (row(el, -2) - fc.ele)),
        j=J)
    vaf = set_i(vaf, -1, fc.vabe, j=J)
    # south
    vaf = set_j(vaf, 1, ramp * (
        fc.vabs - cfg.rfs * jnp.sqrt(g / d[:, 1]) * (el[:, 1] - fc.els)),
        i=I)
    vaf = set_j(vaf, 0, vaf[:, 1], i=I)
    uaf = set_j(uaf, 0, fc.uabs, i=I)
    # north
    vaf = set_j(vaf, -1, ramp * (
        fc.vabn + cfg.rfn * jnp.sqrt(g / col(d, -2)) * (col(el, -2) - fc.eln)),
        i=I)
    uaf = set_j(uaf, -1, fc.uabn, i=I)

    return uaf * grid.dum, vaf * grid.dvm


def bc_vel3d(grid: Grid, cfg: Config,
             uf: jnp.ndarray, vf: jnp.ndarray,
             u: jnp.ndarray, v: jnp.ndarray, d: jnp.ndarray,
             fc: Forcing) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=3: internal velocity — depth-blended partial clamp toward the
    boundary profile (bounds_forcing.f:85-149)."""
    kbm1 = cfg.kbm1
    K = slice(0, kbm1)
    J = slice(1, -1)
    I = slice(1, -1)
    hmax = jnp.max(d)

    def smooth(a):  # tangential 1-2-1 average along the side axis
        return 0.25 * jnp.roll(a, 1, axis=-1) + 0.5 * a \
            + 0.25 * jnp.roll(a, -1, axis=-1)

    # east (i = im-1)
    ga = jnp.sqrt(row(d, -1) / hmax)              # (jm,)
    uf = set_i(uf, -1, ga * smooth(row(u, -2)) + (1.0 - ga) * smooth(fc.ube),
               j=J, k=K)
    vf = set_i(vf, -1, fc.vbe, j=J, k=K)
    # west (i = 0; u-face at i=1)
    ga = jnp.sqrt(d[0, :] / hmax)
    uf = set_i(uf, 1, ga * smooth(u[:, 2, :]) + (1.0 - ga) * smooth(fc.ubw),
               j=J, k=K)
    uf = set_i(uf, 0, uf[:, 1, :], j=J, k=K)
    vf = set_i(vf, 0, fc.vbw, j=J, k=K)
    # south (j = 0; v-face at j=1)
    ga = jnp.sqrt(d[:, 0] / hmax)
    vf = set_j(vf, 1, ga * smooth(v[:, :, 2]) + (1.0 - ga) * smooth(fc.vbs),
               i=I, k=K)
    vf = set_j(vf, 0, vf[:, :, 1], i=I, k=K)
    uf = set_j(uf, 0, fc.ubs, i=I, k=K)
    # north (j = jm-1)
    ga = jnp.sqrt(col(d, -1) / hmax)
    vf = set_j(vf, -1, ga * smooth(col(v, -2)) + (1.0 - ga) * smooth(fc.vbn),
               i=I, k=K)
    uf = set_j(uf, -1, fc.ubn, i=I, k=K)

    return uf * grid.dum, vf * grid.dvm


def bc_ts(grid: Grid, cfg: Config,
          uf: jnp.ndarray, vf: jnp.ndarray,
          t: jnp.ndarray, s: jnp.ndarray,
          u: jnp.ndarray, v: jnp.ndarray, w: jnp.ndarray,
          dt: jnp.ndarray, fc: Forcing) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=4: T/S advective open boundary with vertical-advection correction
    on outflow (bounds_forcing.f:151-242).  ``uf``/``vf`` hold the new T/S
    fields."""
    kbm1 = cfg.kbm1
    K = slice(0, kbm1)
    zz = grid.zz  # (kb,)
    kidx = jnp.arange(cfg.kb)
    # vertical-advection correction applies for 0 < k < kbm1-1
    kmask = ((kidx > 0) & (kidx < kbm1 - 1)).astype(t.dtype)[:, None]

    def wm_corr(w_in, dt_in, f_in):
        # wm = .5 (w_k + w_{k+1}) dti / ((zz_{k-1} - zz_{k+1}) dt)
        dzz2 = (sfk(zz, -1) - sfk(zz, 1))[:, None]
        dzz2 = jnp.where(dzz2 == 0, 1.0, dzz2)
        wm = 0.5 * (w_in + sfk(w_in, 1)) * cfg.dti / (dzz2 * dt_in)
        return kmask * wm * (sfk(f_in, -1) - sfk(f_in, 1))

    def side(f, fb_ext, f_edge_idx, f_in_idx, u1, w_in, dt_in, out_is_le):
        f_edge = row(f, f_edge_idx[0])
        f_in = row(f, f_in_idx[0])
        if out_is_le:   # east/north: inflow when u1 <= 0
            inflow = u1 <= 0.0
            f_inf = f_edge - u1 * (fb_ext - f_edge)
            f_out = f_edge - u1 * (f_edge - f_in) - wm_corr(w_in, dt_in, f_in)
        else:           # west/south
            inflow = u1 >= 0.0
            f_inf = f_edge - u1 * (f_edge - fb_ext)
            f_out = f_edge - u1 * (f_in - f_edge) - wm_corr(w_in, dt_in, f_in)
        return jnp.where(inflow, f_inf, f_out)

    # east: full j range (bounds_forcing.f:157-173)
    u1e = 2.0 * row(u, -1) * cfg.dti / (row(grid.dx, -1) + row(grid.dx, -2))
    tfe = side(t, fc.tbe, (-1,), (-2,), u1e, row(w, -2), row(dt, -2), True)
    sfe = side(s, fc.sbe, (-1,), (-2,), u1e, row(w, -2), row(dt, -2), True)
    uf = set_i(uf, -1, tfe, k=K)
    vf = set_i(vf, -1, sfe, k=K)
    # west (bounds_forcing.f:175-191)
    u1w = 2.0 * u[:, 1, :] * cfg.dti / (grid.dx[0, :] + grid.dx[1, :])
    tfw = side(t, fc.tbw, (0,), (1,), u1w, w[:, 1, :], dt[1, :], False)
    sfw = side(s, fc.sbw, (0,), (1,), u1w, w[:, 1, :], dt[1, :], False)
    uf = set_i(uf, 0, tfw, k=K)
    vf = set_i(vf, 0, sfw, k=K)
    # south: full i range (bounds_forcing.f:194-211)
    u1s = 2.0 * v[:, :, 1] * cfg.dti / (grid.dy[:, 0] + grid.dy[:, 1])
    tfs = side(t.transpose(0, 2, 1), fc.tbs, (0,), (1,), u1s,
               w[:, :, 1], dt[:, 1], False)
    sfs = side(s.transpose(0, 2, 1), fc.sbs, (0,), (1,), u1s,
               w[:, :, 1], dt[:, 1], False)
    uf = set_j(uf, 0, tfs, k=K)
    vf = set_j(vf, 0, sfs, k=K)
    # north (bounds_forcing.f:213-229)
    u1n = 2.0 * col(v, -1) * cfg.dti / (col(grid.dy, -1) + col(grid.dy, -2))
    tfn = side(t.transpose(0, 2, 1), fc.tbn, (-1,), (-2,), u1n,
               col(w, -2), col(dt, -2), True)
    sfn = side(s.transpose(0, 2, 1), fc.sbn, (-1,), (-2,), u1n,
               col(w, -2), col(dt, -2), True)
    uf = set_j(uf, -1, tfn, k=K)
    vf = set_j(vf, -1, sfn, k=K)

    uf = put(uf, uf * grid.fsm, *s_[K])
    vf = put(vf, vf * grid.fsm, *s_[K])
    return uf, vf


def bc_w(grid: Grid, cfg: Config, w: jnp.ndarray) -> jnp.ndarray:
    """idx=5: vertical velocity mask (bounds_forcing.f:244-255)."""
    return put(w, w * grid.fsm, *s_[:cfg.kbm1])


def bc_turb(grid: Grid, cfg: Config,
            uf: jnp.ndarray, vf: jnp.ndarray,
            q2: jnp.ndarray, q2l: jnp.ndarray,
            u: jnp.ndarray, v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=6: q2/q2l upstream open boundary toward ``small``; covers all kb
    levels (bounds_forcing.f:257-325)."""
    small = cfg.small

    def side(f, f_edge_idx, f_in_idx, u1, out_is_le):
        f_edge = row(f, f_edge_idx[0])
        f_in = row(f, f_in_idx[0])
        if out_is_le:
            inflow = u1 <= 0.0
            f_inf = f_edge - u1 * (small - f_edge)
            f_out = f_edge - u1 * (f_edge - f_in)
        else:
            inflow = u1 >= 0.0
            f_inf = f_edge - u1 * (f_edge - small)
            f_out = f_edge - u1 * (f_in - f_edge)
        return jnp.where(inflow, f_inf, f_out)

    # west (bounds_forcing.f:263-273)
    u1w = 2.0 * u[:, 1, :] * cfg.dti / (grid.dx[0, :] + grid.dx[1, :])
    uf = set_i(uf, 0, side(q2, (0,), (1,), u1w, False))
    vf = set_i(vf, 0, side(q2l, (0,), (1,), u1w, False))
    # east
    u1e = 2.0 * row(u, -1) * cfg.dti / (row(grid.dx, -1) + row(grid.dx, -2))
    uf = set_i(uf, -1, side(q2, (-1,), (-2,), u1e, True))
    vf = set_i(vf, -1, side(q2l, (-1,), (-2,), u1e, True))
    # south
    u1s = 2.0 * v[:, :, 1] * cfg.dti / (grid.dy[:, 0] + grid.dy[:, 1])
    uf = set_j(uf, 0, side(q2.transpose(0, 2, 1), (0,), (1,), u1s, False))
    vf = set_j(vf, 0, side(q2l.transpose(0, 2, 1), (0,), (1,), u1s, False))
    # north
    u1n = 2.0 * col(v, -1) * cfg.dti / (col(grid.dy, -1) + col(grid.dy, -2))
    uf = set_j(uf, -1, side(q2.transpose(0, 2, 1), (-1,), (-2,), u1n, True))
    vf = set_j(vf, -1, side(q2l.transpose(0, 2, 1), (-1,), (-2,), u1n, True))

    uf = uf * grid.fsm + 1.0e-10
    vf = vf * grid.fsm + 1.0e-10
    return uf, vf

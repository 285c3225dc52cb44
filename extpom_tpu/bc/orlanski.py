"""Orlanski radiation open boundaries.

Mirrors ``bcondorl(idx)`` (bounds_forcing.f:331-590), the alternative BC set
"specialized for the seamount problem".  The reference's active code uses
these for idx 3 (internal velocity) and 5 (w mask) (advance.f:398,464).

The implicit phase speed is cl = (fb_b - ff_b) / (ff_b + fb_b - 2 f_i),
clamped to [0, 1], evaluated one row inside the boundary.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid


def _cl(ff_b, fb_b, f_i):
    denom = ff_b + fb_b - 2.0 * f_i
    denom = jnp.where(denom == 0.0, 0.01, denom)
    return jnp.clip((fb_b - ff_b) / denom, 0.0, 1.0)


def orl_el(grid: Grid, cfg: Config, elf: jnp.ndarray) -> jnp.ndarray:
    """idx=1: elevation, west/east zero-gradient (bounds_forcing.f:342-350).

    Deviation: the reference leaves the north/south rows untouched (they
    stay at the stale scratch value); here they get the same zero-gradient
    so the scheme is usable standalone with four open sides."""
    elf = elf.at[0, :].set(elf[1, :])
    elf = elf.at[-1, :].set(elf[-2, :])
    elf = elf.at[:, 0].set(elf[:, 1])
    elf = elf.at[:, -1].set(elf[:, -2])
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
    cl = _cl(uaf[-2, J], uab[-2, J], ua[-3, J])
    uaf = uaf.at[-1, J].set(
        (uab[-1, J] * (1.0 - cl) + 2.0 * cl * ua[-2, J]) / (1.0 + cl))
    vaf = vaf.at[-1, J].set(0.0)
    # west (u-face at 1)
    cl = _cl(uaf[2, J], uab[2, J], ua[3, J])
    uaf = uaf.at[1, J].set(
        (uab[1, J] * (1.0 - cl) + 2.0 * cl * ua[2, J]) / (1.0 + cl))
    uaf = uaf.at[0, J].set(uaf[1, J])
    vaf = vaf.at[0, J].set(0.0)
    # south
    cl = _cl(vaf[I, 2], vab[I, 2], va[I, 3])
    vaf = vaf.at[I, 1].set(
        (vab[I, 1] * (1.0 - cl) + 2.0 * cl * va[I, 2]) / (1.0 + cl))
    vaf = vaf.at[I, 0].set(vaf[I, 1])
    uaf = uaf.at[I, 0].set(0.0)
    # north
    cl = _cl(vaf[I, -2], vab[I, -2], va[I, -3])
    vaf = vaf.at[I, -1].set(
        (vab[I, -1] * (1.0 - cl) + 2.0 * cl * va[I, -2]) / (1.0 + cl))
    uaf = uaf.at[I, -1].set(0.0)

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
    cl = _cl(uf[K, -2, J], ub[K, -2, J], u[K, -3, J])
    uf = uf.at[K, -1, J].set(
        (ub[K, -1, J] * (1.0 - cl) + 2.0 * cl * u[K, -2, J]) / (1.0 + cl))
    vf = vf.at[K, -1, J].set(0.0)
    # west
    cl = _cl(uf[K, 2, J], ub[K, 2, J], u[K, 3, J])
    uf = uf.at[K, 1, J].set(
        (ub[K, 1, J] * (1.0 - cl) + 2.0 * cl * u[K, 2, J]) / (1.0 + cl))
    uf = uf.at[K, 0, J].set(uf[K, 1, J])
    vf = vf.at[K, 0, J].set(0.0)
    # south
    cl = _cl(vf[K, I, 2], vb[K, I, 2], v[K, I, 3])
    vf = vf.at[K, I, 1].set(
        (vb[K, I, 1] * (1.0 - cl) + 2.0 * cl * v[K, I, 2]) / (1.0 + cl))
    vf = vf.at[K, I, 0].set(vf[K, I, 1])
    uf = uf.at[K, I, 0].set(0.0)
    # north
    cl = _cl(vf[K, I, -2], vb[K, I, -2], v[K, I, -3])
    vf = vf.at[K, I, -1].set(
        (vb[K, I, -1] * (1.0 - cl) + 2.0 * cl * v[K, I, -2]) / (1.0 + cl))
    uf = uf.at[K, I, -1].set(0.0)

    kmask = (jnp.arange(cfg.kb) < kbm1)[:, None, None]
    uf = jnp.where(kmask, uf * grid.dum, uf)
    vf = jnp.where(kmask, vf * grid.dvm, vf)
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
    ube = ub[:, -1, :]
    tfe = side_ew(uf, t, tb, -1, -2, -3, ube, fc.tbe, False)
    sfe = side_ew(vf, s, sb, -1, -2, -3, ube, fc.sbe, False)
    uf = uf.at[K, -1, :].set(tfe[K])
    vf = vf.at[K, -1, :].set(sfe[K])
    # west: ubw := ub(2) (bounds_forcing.f:519)
    ubw = ub[:, 1, :]
    tfw = side_ew(uf, t, tb, 0, 1, 2, ubw, fc.tbw, True)
    sfw = side_ew(vf, s, sb, 0, 1, 2, ubw, fc.sbw, True)
    uf = uf.at[K, 0, :].set(tfw[K])
    vf = vf.at[K, 0, :].set(sfw[K])

    # Deviation: zero-gradient north/south edges (the reference leaves them
    # at stale scratch values; see orl_el).
    uf = uf.at[K, :, 0].set(uf[K, :, 1])
    uf = uf.at[K, :, -1].set(uf[K, :, -2])
    vf = vf.at[K, :, 0].set(vf[K, :, 1])
    vf = vf.at[K, :, -1].set(vf[K, :, -2])

    uf = uf.at[K].set((uf * grid.fsm)[K])
    vf = vf.at[K].set((vf * grid.fsm)[K])
    return uf, vf


def orl_w(grid: Grid, cfg: Config, w: jnp.ndarray) -> jnp.ndarray:
    """idx=5: w mask (bounds_forcing.f:550-561)."""
    return w.at[:cfg.kbm1].set((w * grid.fsm)[:cfg.kbm1])


def orl_turb(grid: Grid, cfg: Config,
             uf: jnp.ndarray, vf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=6: q2/q2l — clamp west/east edges to 1e-10, mask by fsm
    (bounds_forcing.f:563-585)."""
    uf = uf.at[:, 0, :].set(1.0e-10).at[:, -1, :].set(1.0e-10)
    vf = vf.at[:, 0, :].set(1.0e-10).at[:, -1, :].set(1.0e-10)
    return uf * grid.fsm, vf * grid.fsm

"""Orlanski radiation open boundaries.

Mirrors ``bcondorl(idx)`` (bounds_forcing.f:331-590), the alternative BC set
"specialized for the seamount problem".  The reference's active code uses
these for idx 3 (internal velocity) and 5 (w mask) (advance.f:398,464).

The implicit phase speed is cl = (fb_b - ff_b) / (ff_b + fb_b - 2 f_i),
clamped to [0, 1], evaluated one row inside the boundary.  All edge writes
are branch-free masked selects in FULL-ARRAY form (whole-field expressions
built from :func:`sft` shifted reads, masked onto the edge row), valid
unchanged on global arrays, padded ragged decompositions, and shard_map
local blocks (see extpom_tpu.ops.stencil).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.ops.stencil import sft, put, set_i, set_j, s_


def _cl(ff_b, fb_b, f_i):
    denom = ff_b + fb_b - 2.0 * f_i
    denom = jnp.where(denom == 0.0, 0.01, denom)
    return jnp.clip((fb_b - ff_b) / denom, 0.0, 1.0)


def orl_el(grid: Grid, cfg: Config, elf: jnp.ndarray) -> jnp.ndarray:
    """idx=1: elevation, west/east zero-gradient (bounds_forcing.f:342-350).

    Deviation: the reference leaves the north/south rows untouched (they
    stay at the stale scratch value); here they get the same zero-gradient
    so the scheme is usable standalone with four open sides."""
    elf = set_i(elf, 0, sft(elf, 1, 0))
    elf = set_i(elf, -1, sft(elf, -1, 0))
    elf = set_j(elf, 0, sft(elf, 0, 1))
    elf = set_j(elf, -1, sft(elf, 0, -1))
    return elf * grid.fsm


def _orl_uv(uaf, vaf, ua, uab, va, vab, J, I, k=slice(None)):
    """Shared Orlanski radiation for a (u-like, v-like) pair — the identical
    stencil serves the external (2-D) and internal (3-D) variants
    (bounds_forcing.f:352-416 / 418-487)."""
    # east (u-face at im-1; phase speed from the face at im-2): the value
    # committed at row im-1 reads uaf/uab one row in and ua two rows in
    cl = _cl(sft(uaf, -1, 0), sft(uab, -1, 0), sft(ua, -2, 0))
    uaf = set_i(uaf, -1,
                (uab * (1.0 - cl) + 2.0 * cl * sft(ua, -1, 0)) / (1.0 + cl),
                j=J, k=k)
    vaf = set_i(vaf, -1, 0.0, j=J, k=k)
    # west (u-face at 1): committed row 1 reads uaf/uab at row 2 = sft +1,
    # ua at row 3 = sft +2
    cl = _cl(sft(uaf, 1, 0), sft(uab, 1, 0), sft(ua, 2, 0))
    uaf = set_i(uaf, 1,
                (uab * (1.0 - cl) + 2.0 * cl * sft(ua, 1, 0)) / (1.0 + cl),
                j=J, k=k)
    uaf = set_i(uaf, 0, sft(uaf, 1, 0), j=J, k=k)
    vaf = set_i(vaf, 0, 0.0, j=J, k=k)
    # south (v-face at 1)
    cl = _cl(sft(vaf, 0, 1), sft(vab, 0, 1), sft(va, 0, 2))
    vaf = set_j(vaf, 1,
                (vab * (1.0 - cl) + 2.0 * cl * sft(va, 0, 1)) / (1.0 + cl),
                i=I, k=k)
    vaf = set_j(vaf, 0, sft(vaf, 0, 1), i=I, k=k)
    uaf = set_j(uaf, 0, 0.0, i=I, k=k)
    # north
    cl = _cl(sft(vaf, 0, -1), sft(vab, 0, -1), sft(va, 0, -2))
    vaf = set_j(vaf, -1,
                (vab * (1.0 - cl) + 2.0 * cl * sft(va, 0, -1)) / (1.0 + cl),
                i=I, k=k)
    uaf = set_j(uaf, -1, 0.0, i=I, k=k)
    return uaf, vaf


def orl_vel2d(grid: Grid, cfg: Config,
              uaf: jnp.ndarray, vaf: jnp.ndarray,
              ua: jnp.ndarray, uab: jnp.ndarray,
              va: jnp.ndarray, vab: jnp.ndarray,
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=2: external velocity Orlanski radiation
    (bounds_forcing.f:352-416)."""
    uaf, vaf = _orl_uv(uaf, vaf, ua, uab, va, vab,
                       J=slice(1, -1), I=slice(1, -1))
    return uaf * grid.dum, vaf * grid.dvm


def orl_vel3d(grid: Grid, cfg: Config,
              uf: jnp.ndarray, vf: jnp.ndarray,
              u: jnp.ndarray, ub: jnp.ndarray,
              v: jnp.ndarray, vb: jnp.ndarray,
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx=3: internal velocity Orlanski radiation
    (bounds_forcing.f:418-487)."""
    K = slice(0, cfg.kbm1)
    uf, vf = _orl_uv(uf, vf, u, ub, v, vb,
                     J=slice(1, -1), I=slice(1, -1), k=K)
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

    def side_ew(ff, f, fb, d_in, ubc, fb_ext, inflow_ge):
        """d_in = +1 (west: inner rows are i+1, i+2) or -1 (east)."""
        cl = _cl(sft(ff, d_in, 0), sft(fb, d_in, 0), sft(f, 2 * d_in, 0))
        new = (fb * (1.0 - cl) + 2.0 * cl * sft(f, d_in, 0)) / (1.0 + cl)
        if inflow_ge:   # west: inflow when ub >= 0
            clamp = (cl == 0.0) & (ubc >= 0.0)
        else:           # east: inflow when ub <= 0
            clamp = (cl == 0.0) & (ubc <= 0.0)
        return jnp.where(clamp, fb_ext, new)

    # east: boundary normal velocity ube := ub(im) — ub itself at the
    # committed edge row (bounds_forcing.f:497)
    tfe = side_ew(uf, t, tb, -1, ub, fc.tbe[:, None, :], False)
    sfe = side_ew(vf, s, sb, -1, ub, fc.sbe[:, None, :], False)
    uf = set_i(uf, -1, tfe, k=K)
    vf = set_i(vf, -1, sfe, k=K)
    # west: ubw := ub(2) = sft(ub, 1, 0) at the committed row 0
    # (bounds_forcing.f:519)
    ubw = sft(ub, 1, 0)
    tfw = side_ew(uf, t, tb, 1, ubw, fc.tbw[:, None, :], True)
    sfw = side_ew(vf, s, sb, 1, ubw, fc.sbw[:, None, :], True)
    uf = set_i(uf, 0, tfw, k=K)
    vf = set_i(vf, 0, sfw, k=K)

    # Deviation: zero-gradient north/south edges (the reference leaves them
    # at stale scratch values; see orl_el).
    uf = set_j(uf, 0, sft(uf, 0, 1), k=K)
    uf = set_j(uf, -1, sft(uf, 0, -1), k=K)
    vf = set_j(vf, 0, sft(vf, 0, 1), k=K)
    vf = set_j(vf, -1, sft(vf, 0, -1), k=K)

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

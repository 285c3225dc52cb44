"""Momentum advection: horizontal terms (advct) and the full u/v updates
(advu/advv) including Coriolis, surface slope and baroclinic forcing.

Mirrors solver.f:201-408 (advct), 734-788 (advu), 791-845 (advv).
3-D arrays are (kb, im, jm); 2-D metric arrays broadcast over k.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.ops.stencil import sft, sfk, put, set_i, set_j, set_k, s_


def advct(grid: Grid, cfg: Config,
          u: jnp.ndarray, v: jnp.ndarray, ub: jnp.ndarray, vb: jnp.ndarray,
          aam: jnp.ndarray, dt: jnp.ndarray,
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Horizontal advection + diffusion of momentum -> (advx, advy).

    Computed once per internal step; the external mode consumes the vertical
    integrals (solver.f:201-408).
    """
    dx, dy = grid.dx, grid.dy
    kbm1 = cfg.kbm1
    KM1 = slice(0, kbm1)
    z3 = jnp.zeros_like(u)

    dx4 = dx + sft(dx, -1, 0) + sft(dx, 0, -1) + sft(dx, -1, -1)
    dy4 = dy + sft(dy, -1, 0) + sft(dy, 0, -1) + sft(dy, -1, -1)
    dt4 = dt + sft(dt, -1, 0) + sft(dt, 0, -1) + sft(dt, -1, -1)
    aam4 = aam + sft(aam, -1, 0) + sft(aam, 0, -1) + sft(aam, -1, -1)
    dtaam = 0.25 * dt4 * aam4

    # metric curvature (solver.f:218-229)
    curv = put(z3, (0.25 * ((sft(v, 0, 1) + v) * (sft(dy, 1, 0) - sft(dy, -1, 0))
                 - (sft(u, 1, 0) + u) * (sft(dx, 0, 1) - sft(dx, 0, -1)))
         / (dx * dy)), *s_[KM1, 1:-1, 1:-1])

    # ---- x-component (solver.f:231-313) ----
    xflux = put(z3, (0.125 * ((sft(dt, 1, 0) + dt) * sft(u, 1, 0)
                  + (dt + sft(dt, -1, 0)) * u)
         * (sft(u, 1, 0) + u)), *s_[KM1, 1:-1, :])
    yflux = put(z3, (0.125 * ((dt + sft(dt, 0, -1)) * v
                  + (sft(dt, -1, 0) + sft(dt, -1, -1)) * sft(v, -1, 0))
         * (u + sft(u, 0, -1))), *s_[KM1, 1:, 1:])
    # diffusive fluxes + metric scaling (solver.f:254-277)
    xflux = put(xflux, (dy * (xflux - dt * aam * 2.0 * (sft(ub, 1, 0) - ub) / dx)), *s_[KM1, 1:-1, 1:])
    yflux = put(yflux, (0.25 * dx4 * (yflux
                       - dtaam * ((ub - sft(ub, 0, -1)) / dy4
                                  + (vb - sft(vb, -1, 0)) / dx4))), *s_[KM1, 1:-1, 1:])

    advx = put(z3, (xflux - sft(xflux, -1, 0) + sft(yflux, 0, 1) - yflux), *s_[KM1, 1:-1, 1:-1])
    # curvature term; global west edge excludes i=2 (solver.f:291-313)
    advx = put(advx, (advx - grid.aru * 0.25
         * (curv * dt * (sft(v, 0, 1) + v)
            + sft(curv, -1, 0) * sft(dt, -1, 0)
            * (sft(v, -1, 1) + sft(v, -1, 0)))), *s_[KM1, 2:-1, 1:-1])

    # ---- y-component (solver.f:317-403) ----
    xflux = put(z3, (0.125 * ((dt + sft(dt, -1, 0)) * u
                  + (sft(dt, 0, -1) + sft(dt, -1, -1)) * sft(u, 0, -1))
         * (v + sft(v, -1, 0))), *s_[KM1, 1:, 1:])
    yflux = put(z3, (0.125 * ((sft(dt, 0, 1) + dt) * sft(v, 0, 1)
                  + (dt + sft(dt, 0, -1)) * v)
         * (sft(v, 0, 1) + v)), *s_[KM1, :, 1:-1])
    xflux = put(xflux, (0.25 * dy4 * (xflux
                       - dtaam * ((ub - sft(ub, 0, -1)) / dy4
                                  + (vb - sft(vb, -1, 0)) / dx4))), *s_[KM1, 1:, 1:-1])
    yflux = put(yflux, (dx * (yflux - dt * aam * 2.0 * (sft(vb, 0, 1) - vb) / dy)), *s_[KM1, 1:, 1:-1])

    advy = put(z3, (sft(xflux, 1, 0) - xflux + yflux - sft(yflux, 0, -1)), *s_[KM1, 1:-1, 1:-1])
    # curvature term; global south edge excludes j=2 (solver.f:381-403)
    advy = put(advy, (advy + grid.arv * 0.25
         * (curv * dt * (sft(u, 1, 0) + u)
            + sft(curv, 0, -1) * sft(dt, 0, -1)
            * (sft(u, 1, -1) + sft(u, 0, -1)))), *s_[KM1, 1:-1, 2:-1])

    return advx, advy


def advu(grid: Grid, cfg: Config,
         u: jnp.ndarray, ub: jnp.ndarray, v: jnp.ndarray, w: jnp.ndarray,
         advx: jnp.ndarray, drhox: jnp.ndarray, dt: jnp.ndarray,
         egf: jnp.ndarray, egb: jnp.ndarray, e_atmos: jnp.ndarray,
         etb: jnp.ndarray, etf: jnp.ndarray) -> jnp.ndarray:
    """Full u-momentum tendency + leapfrog step -> uf (solver.f:734-788)."""
    h, dy, aru, cor = grid.h, grid.dy, grid.aru, grid.cor
    kbm1 = cfg.kbm1
    KM1 = slice(0, kbm1)
    z3 = jnp.zeros_like(u)

    # vertical advection (solver.f:741-751: k=2..kbm1, j=1..jm, i=2..im);
    # kept in a separate array so the combine step below reads the k+1
    # value pre-overwrite, like the ascending-k Fortran loop
    vadv = put(z3, (0.25 * (w + sft(w, -1, 0)) * (u + sfk(u, -1))), *s_[1:kbm1, 1:, :])

    uf = put(z3, (advx
         + (vadv - sfk(vadv, 1)) * aru / grid.dz3
         - aru * 0.25 * (cor * dt * (sft(v, 0, 1) + v)
                         + sft(cor, -1, 0) * sft(dt, -1, 0)
                         * (sft(v, -1, 1) + sft(v, -1, 0)))
         + cfg.grav * 0.125 * (dt + sft(dt, -1, 0))
         * (egf - sft(egf, -1, 0) + egb - sft(egb, -1, 0)
            + (e_atmos - sft(e_atmos, -1, 0)) * 2.0)
         * (dy + sft(dy, -1, 0))
         + drhox), *s_[KM1, 1:-1, 1:-1])
    # outside the combine region, the reference's uf holds the raw vertical
    # advection values until profu/bcond overwrite or mask them; keep them
    uf = put(uf, vadv, *s_[1:kbm1, :, 0:1])
    uf = put(uf, vadv, *s_[1:kbm1, :, -1:])
    uf = put(uf, vadv, *s_[1:kbm1, -1:, 1:-1])

    # leapfrog step (solver.f:775-785)
    uf = put(uf, (((h + etb + sft(h, -1, 0) + sft(etb, -1, 0)) * aru * ub
          - 2.0 * cfg.dti2 * uf)
         / ((h + etf + sft(h, -1, 0) + sft(etf, -1, 0)) * aru)), *s_[KM1, 1:-1, 1:-1])
    return uf


def advv(grid: Grid, cfg: Config,
         v: jnp.ndarray, vb: jnp.ndarray, u: jnp.ndarray, w: jnp.ndarray,
         advy: jnp.ndarray, drhoy: jnp.ndarray, dt: jnp.ndarray,
         egf: jnp.ndarray, egb: jnp.ndarray, e_atmos: jnp.ndarray,
         etb: jnp.ndarray, etf: jnp.ndarray) -> jnp.ndarray:
    """Full v-momentum tendency + leapfrog step -> vf (solver.f:791-845)."""
    h, dx, arv, cor = grid.h, grid.dx, grid.arv, grid.cor
    kbm1 = cfg.kbm1
    KM1 = slice(0, kbm1)
    z3 = jnp.zeros_like(v)

    # solver.f:801-808: k=2..kbm1, j=2..jm, i=1..im
    vadv = put(z3, (0.25 * (w + sft(w, 0, -1)) * (v + sfk(v, -1))), *s_[1:kbm1, :, 1:])

    vf = put(z3, (advy
         + (vadv - sfk(vadv, 1)) * arv / grid.dz3
         + arv * 0.25 * (cor * dt * (sft(u, 1, 0) + u)
                         + sft(cor, 0, -1) * sft(dt, 0, -1)
                         * (sft(u, 1, -1) + sft(u, 0, -1)))
         + cfg.grav * 0.125 * (dt + sft(dt, 0, -1))
         * (egf - sft(egf, 0, -1) + egb - sft(egb, 0, -1)
            + (e_atmos - sft(e_atmos, 0, -1)) * 2.0)
         * (dx + sft(dx, 0, -1))
         + drhoy), *s_[KM1, 1:-1, 1:-1])
    vf = put(vf, vadv, *s_[1:kbm1, 0:1, :])
    vf = put(vf, vadv, *s_[1:kbm1, -1:, :])
    vf = put(vf, vadv, *s_[1:kbm1, 1:-1, -1:])

    vf = put(vf, (((h + etb + sft(h, 0, -1) + sft(etb, 0, -1)) * arv * vb
          - 2.0 * cfg.dti2 * vf)
         / ((h + etf + sft(h, 0, -1) + sft(etf, 0, -1)) * arv)), *s_[KM1, 1:-1, 1:-1])
    return vf
